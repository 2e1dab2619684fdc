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
