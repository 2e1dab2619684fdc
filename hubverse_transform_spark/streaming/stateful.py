"""Custom stateful streaming operators [EXT]: ``applyInPandasWithState``.

Windows/watermarks (streaming.windows) cover time-bucketed state; this module
covers *arbitrary* per-key state that must survive across micro-batches —
running totals, cross-batch dedup — the cases ``groupBy().agg()`` cannot
express incrementally.

Scale notes: state lives in the executor state store partitioned by key, so
the operator shuffles once on the key and scales with distinct keys, not with
events; each micro-batch touches only the keys it contains. Pandas transfer is
Arrow-batched per key group.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_running_totals(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) maintained across micro-batches.

    Emits one row per key per micro-batch with the cumulative totals so far —
    the incremental form of ``groupBy(key).agg(count, sum)`` whose state
    persists in the checkpoint: re-running over a new batch continues from the
    prior totals instead of rescanning history.

    Output schema: ``(key, n_events long, sum_value double)``.
    """
    out_schema = f"{key_col} long, n_events long, sum_value double"
    state_schema = "n long, s double"

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "sum_value": [s]})

    return events.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stateful_seen_filter(
    events: DataFrame,
    *,
    key_col: str = "event_id",
) -> DataFrame:
    """Cross-batch exact dedup: pass each key through at most once, ever.

    The streaming complement of ``dropDuplicates`` — batch dedup only sees one
    batch, while this remembers every key it has emitted in the state store,
    so replays and late duplicates in later micro-batches are dropped. State is
    one empty marker per key (the store itself is the set).
    """
    out_schema = f"{key_col} long, first_seen_batch long"
    state_schema = "seen long"

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        for _ in pdfs:
            pass  # drain; only existence matters
        if state.exists:
            yield pd.DataFrame({key_col: [], "first_seen_batch": []}).astype(
                {key_col: "int64", "first_seen_batch": "int64"}
            )
        else:
            state.update((1,))
            yield pd.DataFrame({key_col: [key[0]], "first_seen_batch": [0]})

    return events.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def transform_with_state_user_stats(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
    recent_k: int = 3,
) -> DataFrame:
    """Per-key cross-batch statistics via ``transformWithStateInPandas`` —
    Spark 4's typed-state successor to ``applyInPandasWithState``.

    Maintains TWO composable state variables per key (the capability the old
    API lacks: one opaque tuple vs named, independently-evolvable states):

    - ``totals``   ValueState(n, s): running count/sum,
    - ``recent``   ListState(v):     the last ``recent_k`` values seen.

    Emits one row per key per micro-batch:
    ``(key, n_events, sum_value, recent_max)`` where recent_max covers only
    the trailing window — distinguishing "large lifetime total" from "spiking
    right now", the per-entity monitor shape.

    Scale: state is per-key in the executor state store (RocksDB provider),
    one shuffle on the key; ListState appends are O(k) per batch, state size
    O(distinct keys x k). Requires
    ``spark.sql.streaming.stateStore.providerClass = RocksDBStateStoreProvider``
    (the HDFS-backed default does not support transformWithState).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = f"{key_col} long, n_events long, sum_value double, recent_max double"

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, s double")
            self._recent = handle.getListState("recent", "v double")

        def handleInputRows(self, key, rows, timerValues):
            n, s = self._totals.get() if self._totals.exists() else (0, 0.0)
            vals: list[float] = []
            for pdf in rows:
                n += len(pdf)
                s += float(pdf[value_col].sum())
                vals.extend(float(v) for v in pdf[value_col])
            old = [r[0] for r in self._recent.get()] if self._recent.exists() else []
            recent = (old + vals)[-recent_k:]
            self._totals.update((n, s))
            self._recent.put([(v,) for v in recent])
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n_events": [n],
                    "sum_value": [s],
                    "recent_max": [max(recent)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=UserStats(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def transform_with_state_session_expiry(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_ms: int = 30_000,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Event-time session closing via ``transformWithStateInPandas`` TIMERS —
    the capability neither windowed aggregation nor the old
    ``applyInPandasWithState`` timeouts express: sessions close when the
    WATERMARK (event time) passes last-activity + gap, not when wall-clock
    happens to tick, so replaying history closes exactly the same sessions
    at the same points (the ``stateful_session_agg`` sibling uses
    processing-time timeouts and is replay-UNSTABLE by construction).

    Per key: ``handleInputRows`` folds the batch into a ValueState
    ``(start, end, n, sum, timer)`` and re-arms an event-time timer at
    ``end + gap_ms`` (deleting the previous one — at most one live timer
    per key); ``handleExpiredTimer`` fires when the watermark passes that
    point, emits the closed session, and clears state + timer, so state
    size tracks ACTIVE keys only. Emission happens exclusively on expiry
    (Append semantics).

    Scale: one shuffle on the key; timers live in the state store alongside
    the value state (RocksDB provider required); no-data micro-batches
    (on by default) service expired timers even when a key goes quiet.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    out_schema = (
        f"{key_col} long, n_events long, sum_value double, "
        "start_ms long, end_ms long"
    )

    class SessionExpiry(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._sess = handle.getValueState(
                "sess", "start long, end long, n long, s double, timer long"
            )

        def handleInputRows(self, key, rows, timerValues: TimerValues):
            start = end = None
            n, s = 0, 0.0
            old_timer = None
            if self._sess.exists():
                start, end, n, s, old_timer = self._sess.get()
            for pdf in rows:
                ts_ms = (pdf[ts_col].astype("int64") // 1_000_000).tolist()
                n += len(pdf)
                s += float(pdf[value_col].sum())
                lo, hi = min(ts_ms), max(ts_ms)
                start = lo if start is None else min(start, lo)
                end = hi if end is None else max(end, hi)
            new_timer = end + gap_ms
            if old_timer is not None and old_timer != new_timer:
                self._handle.deleteTimer(old_timer)
            self._handle.registerTimer(new_timer)
            self._sess.update((start, end, n, s, new_timer))
            return
            yield  # pragma: no cover - generator with no per-batch emission

        def handleExpiredTimer(
            self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ):
            if not self._sess.exists():
                return
            start, end, n, s, _timer = self._sess.get()
            self._sess.clear()
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n_events": [n],
                    "sum_value": [s],
                    "start_ms": [start],
                    "end_ms": [end],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=SessionExpiry(),
            outputStructType=out_schema,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def transform_with_state_type_counts(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    type_col: str = "event_type",
    initial_state=None,
) -> DataFrame:
    """Per-key per-category counters via ``transformWithStateInPandas``
    MapState — the third typed-state variable (ValueState: q.v.
    ``transform_with_state_user_stats``; ListState: ibid.; timers:
    ``transform_with_state_session_expiry``) — plus BATCH-BOOTSTRAPPED
    state: ``initial_state`` (a DataFrame of ``(key, category, n)``) seeds
    each key's map through ``handleInitialState`` before the first batch,
    the warm-start every lambda-architecture migration needs (fold the
    historical batch aggregate in once, then stream increments on top).

    MapState keeps one entry per (key, category) in the state store —
    point lookups/updates per category seen in the batch, NOT a
    read-modify-write of a whole collection (what ListState/ValueState
    would force); per-batch work is O(categories touched), emission
    iterates the key's map (O(categories per key), bounded by the domain).

    Emits ``(key, n_types, n_events, top_type, top_n)`` per key per batch
    (Update semantics), top ties broken by category name.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = (
        f"{key_col} long, n_types long, n_events long, top_type string, top_n long"
    )

    class TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._by_type = handle.getMapState("bytype", "t string", "n long")

        def handleInitialState(self, key, initialState, timerValues) -> None:
            for t, n in zip(initialState[type_col], initialState["n"]):
                self._by_type.updateValue((str(t),), (int(n),))

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                for t, n in pdf[type_col].value_counts().items():
                    tk = (str(t),)
                    old = (
                        self._by_type.getValue(tk)[0]
                        if self._by_type.containsKey(tk)
                        else 0
                    )
                    self._by_type.updateValue(tk, (old + int(n),))
            counts = {
                t[0]: n[0]
                for t, n in self._by_type.iterator()
            }
            top_type, top_n = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0])
            )
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n_types": [len(counts)],
                    "n_events": [sum(counts.values())],
                    "top_type": [top_type],
                    "top_n": [top_n],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=TypeCounts(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
        initialState=(
            initial_state.groupBy(key_col) if initial_state is not None else None
        ),
    )


def watermarked_dedup(
    events: DataFrame,
    *,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup with BOUNDED state: ``dropDuplicatesWithinWatermark``.

    The scale-correct complement of ``stateful_seen_filter`` — that operator
    remembers every key forever (state grows with distinct keys, right for
    exactly-once replay protection over bounded id spaces); this one drops
    duplicates arriving within the watermark delay of the first sighting and
    EXPIRES each key's state once the watermark passes it, so state size is
    bounded by traffic per watermark window regardless of stream lifetime —
    the only viable shape for an unbounded 100 TB/day dedup.

    Works on a streaming DataFrame; on a static frame falls back to plain
    ``dropDuplicates`` (same result for data within one watermark span).
    """
    keys = key_cols or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stateful_session_agg(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
    gap_ms: int = 2000,
) -> DataFrame:
    """Session aggregation with a PROCESSING-TIME STATE TIMEOUT: events
    accumulate per key; when a key goes quiet for ``gap_ms`` of processing
    time the session is EMITTED AND ITS STATE FREED — the bounded-state
    pattern every long-running stateful job needs (NoTimeout state grows
    with the key universe forever; timeout state grows with the *active*
    key set).

    Emits ``(key, n_events, sum_value, closed)`` — ``closed=false`` rows are
    in-progress snapshots on each batch a key appears in; the final
    ``closed=true`` row arrives via the timeout path after the gap. Callers
    keyed by idempotent sinks take the last row per key.

    This is the ``applyInPandasWithState`` sibling of
    ``windows.session_window_agg`` (event-time session windows): use the
    built-in when event-time gaps define the session; use this when the
    session must close on PROCESSING quiet time (e.g. devices with broken
    clocks) or must carry arbitrary extra state.
    """
    out_schema = f"{key_col} long, n_events long, sum_value double, closed boolean"
    state_schema = "n long, s double"

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, s = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n_events": [n],
                    "sum_value": [s],
                    "closed": [True],
                }
            )
            return
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        state.setTimeoutDuration(gap_ms)
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "closed": [False],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
