"""Batch sessionization [EXT]: gaps-and-islands session assignment over an
event log (events table shape: event_id, ts, user_id, event_type, value).

The streaming engine covers sessions via ``F.session_window``
(streaming/windows.py); this is the batch-analytic equivalent that also
exposes the session id and per-session extents, which session_window's
merged-window aggregation cannot (it only yields the window struct).

Scale posture: one shuffle on the partition key; both window functions and
the per-session aggregate reuse the same (user, ts) sort order, so Spark
plans a single Exchange + Sort for the whole operator chain. At 100 TB the
only knob that matters is key cardinality — user-partitioned windows scale
with distinct users, and a hot user degrades to a single-task sort (cap
per-user history upstream if that is a real risk).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_seconds(col: Column) -> Column:
    """Timestamp → fractional epoch seconds, safe for TIMESTAMP_NTZ and
    independent of the session timezone.

    Spark 4 forbids CAST(TIMESTAMP_NTZ AS DOUBLE) (the driver's parquet stores
    ``ts`` as timestamp[us] without a zone, which Spark reads as NTZ). A bare
    NTZ→LTZ cast would interpret the wall time in the *session* timezone, so
    gap differences straddling a DST transition would be off by the shift;
    ``to_utc_timestamp(col, 'UTC')`` instead pins the wall-clock
    interpretation to UTC (a fixed offset), making differences exact under
    any session timezone, and ``unix_micros`` keeps microsecond precision.
    """
    return F.unix_micros(F.to_utc_timestamp(col, "UTC")).cast("double") / 1e6


def _epoch_micros(col: Column) -> Column:
    """Timestamp → exact integer epoch microseconds (same NTZ/UTC pinning
    as ``_epoch_seconds``). Durations derived from this stay exact-integer,
    so rounded statistics can use the engine-stable floor(x+0.5) half-up
    instead of round(double) — round(double, d) of a value that can sit on
    a half boundary (a duration whose micros end in exactly 500) rounds
    differently across engines on the same double."""
    return F.unix_micros(F.to_utc_timestamp(col, "UTC"))


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Assign a per-user session sequence number to every event.

    A new session starts at the first event of a user and whenever the gap
    to the previous event is >= ``gap_seconds`` (same boundary convention as
    ``session_window_agg``: a session extends while gaps stay strictly
    below the threshold). Returns the input plus a ``session_seq`` column
    (1-based, per user).
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (_epoch_seconds(F.col(ts_col)) - _epoch_seconds(prev_ts) >= gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_seq",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def session_stats(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Per-user session statistics: session count, event total, and session
    duration aggregates (seconds, fractional).

    Two-level aggregation over the sessionized frame; the session grouping
    key (user, session_seq) is a refinement of the window partition key, so
    no extra shuffle is needed between the window and the first groupBy.
    """
    sess = sessionize(df, ts_col, user_col, gap_seconds, tiebreak_col)
    per_session = sess.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(_epoch_micros(F.col(ts_col))) - F.min(_epoch_micros(F.col(ts_col)))).alias(
            "duration_us"
        ),
    )
    # exact-integer micros + floor half-up: a duration whose micros end in
    # exactly 500 sits ON the 3-decimal half boundary, where round(double)
    # diverges across engines; floor over the identical IEEE quotient cannot
    return per_session.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
        (
            F.floor(
                F.sum("duration_us").cast("double") * 1e3
                / (F.count(F.lit(1)) * 1000000)
                + 0.5
            )
            / 1e3
        ).alias("avg_session_s"),
        (F.floor(F.max("duration_us").cast("double") / 1e3 + 0.5) / 1e3).alias(
            "max_session_s"
        ),
    )
