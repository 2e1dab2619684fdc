"""applyInPandasWithState: state must survive across micro-batches and across
restarts from the same checkpoint."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hubverse_transform_spark.streaming.stateful import (
    stateful_running_totals,
    stateful_seen_filter,
)


def _write_events(spark, src: Path, rows, mode="append"):
    df = spark.createDataFrame(rows, ["user_id", "value", "event_id"]).select(
        F.col("user_id").cast("long"),
        F.col("value").cast("double"),
        F.col("event_id").cast("long"),
    )
    df.coalesce(1).write.mode(mode).parquet(str(src))
    return df.schema


def _run_stream(spark, src: Path, schema, op, ckpt: str, name: str):
    # foreachBatch (not the memory sink): only fault-tolerant sinks may resume
    # from an existing checkpoint, and resuming is exactly what's under test
    stream = spark.readStream.schema(schema).parquet(str(src))
    results: list = []

    def sink(batch_df, batch_id):
        results.extend(batch_df.collect())

    q = (
        op(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return results


def test_running_totals_accumulate_across_restarts(spark, tmp_path: Path):
    src, ckpt = tmp_path / "src", str(tmp_path / "ckpt")
    schema = _write_events(spark, src, [(1, 10.0, 100), (1, 5.0, 101), (2, 1.0, 102)])

    rows = _run_stream(spark, src, schema, stateful_running_totals, ckpt, "rt1")
    got = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in rows}
    assert got == {1: (2, 15.0), 2: (1, 1.0)}

    # second batch, new query from the SAME checkpoint: totals continue
    _write_events(spark, src, [(1, 100.0, 103)])
    rows2 = _run_stream(spark, src, schema, stateful_running_totals, ckpt, "rt2")
    got2 = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in rows2}
    assert got2[1] == (3, 115.0)  # cumulative, not per-batch
    assert 2 not in got2  # untouched keys don't re-emit in update mode


def test_seen_filter_dedups_across_batches(spark, tmp_path: Path):
    src, ckpt = tmp_path / "src", str(tmp_path / "ckpt")
    schema = _write_events(spark, src, [(1, 1.0, 100), (2, 1.0, 101), (2, 2.0, 101)])

    rows = _run_stream(
        spark, src, schema, lambda df: stateful_seen_filter(df, key_col="event_id"), ckpt, "sf1"
    )
    assert sorted(r["event_id"] for r in rows) == [100, 101]  # in-batch dup collapsed

    # replayed key 101 in a later batch is suppressed; 102 passes
    _write_events(spark, src, [(3, 9.0, 101), (3, 9.0, 102)])
    rows2 = _run_stream(
        spark, src, schema, lambda df: stateful_seen_filter(df, key_col="event_id"), ckpt, "sf2"
    )
    assert sorted(r["event_id"] for r in rows2) == [102]


def test_watermarked_dedup_bounded_state(spark, tmp_path: Path):
    from hubverse_transform_spark.streaming.stateful import watermarked_dedup

    src = tmp_path / "dedup_src"
    src.mkdir()
    rows1 = [(1, "2024-01-01 00:01:00", 1.0), (2, "2024-01-01 00:02:00", 2.0)]
    rows2 = [(1, "2024-01-01 00:03:00", 9.9), (3, "2024-01-01 00:04:00", 3.0)]
    schema = "event_id long, ts timestamp, value double"

    def write_batch(rows, name):
        spark.createDataFrame(
            [(i, ts, v) for i, ts, v in rows], ["event_id", "ts_str", "value"]
        ).select(
            "event_id", F.to_timestamp("ts_str").alias("ts"), "value"
        ).coalesce(1).write.mode("append").parquet(str(src))

    write_batch(rows1, "b1")
    write_batch(rows2, "b2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = watermarked_dedup(stream, key_cols=["event_id"], ts_col="ts", watermark="10 minutes")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("wm_dedup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM wm_dedup").collect()
    # duplicate event_id=1 arriving within the watermark is dropped; which of
    # the two copies survives depends on file processing order
    assert sorted(r.event_id for r in rows) == [1, 2, 3]
    assert next(r.value for r in rows if r.event_id == 1) in (1.0, 9.9)


def test_watermarked_dedup_static_fallback(spark):
    from hubverse_transform_spark.streaming.stateful import watermarked_dedup

    df = spark.createDataFrame(
        [(1, 1.0), (1, 1.0), (2, 2.0)], "event_id long, value double"
    )
    assert watermarked_dedup(df, key_cols=["event_id", "value"]).count() == 2


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas' driver worker requires the protobuf "
    "python package (not installed in this container)",
)
def test_transform_with_state_across_restarts(spark, tmp_path: Path):
    from hubverse_transform_spark.streaming.stateful import (
        transform_with_state_user_stats,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src, ckpt = tmp_path / "src", str(tmp_path / "ckpt")
        schema = _write_events(
            spark, src, [(1, 10.0, 100), (1, 5.0, 101), (2, 1.0, 102)]
        )
        rows = _run_stream(
            spark, src, schema, transform_with_state_user_stats, ckpt, "tws1"
        )
        got = {r["user_id"]: (r["n_events"], r["sum_value"], r["recent_max"]) for r in rows}
        assert got == {1: (2, 15.0, 10.0), 2: (1, 1.0, 1.0)}

        # restart from the same checkpoint: ValueState totals continue,
        # ListState window slides (last 3 of [10, 5, 100, 2] -> max 100)
        _write_events(spark, src, [(1, 100.0, 103), (1, 2.0, 104)])
        rows2 = _run_stream(
            spark, src, schema, transform_with_state_user_stats, ckpt, "tws2"
        )
        got2 = {r["user_id"]: (r["n_events"], r["sum_value"], r["recent_max"]) for r in rows2}
        assert got2[1] == (4, 117.0, 100.0)
        assert 2 not in got2
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_session_agg_times_out_and_frees_state(spark, tmp_path: Path):
    """ProcessingTimeTimeout closes quiet sessions and frees their state.

    Driven with a processingTime trigger + sleeps: availableNow does not
    cooperate with processing-time timeouts (the run can end before a
    timed-out key is serviced), so the query stays up while batches fire.
    """
    import time

    from hubverse_transform_spark.streaming.stateful import stateful_session_agg

    src, ckpt = tmp_path / "src", str(tmp_path / "ckpt")
    schema = _write_events(spark, src, [(1, 10.0, 100), (1, 5.0, 101)])

    stream = spark.readStream.schema(schema).parquet(str(src))
    results: list = []
    q = (
        stateful_session_agg(stream, gap_ms=1500)
        .writeStream.foreachBatch(lambda b, _i: results.extend(b.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        # phase 1: in-progress snapshot for the open session
        while time.time() < deadline and not results:
            time.sleep(0.5)
        assert [(r["user_id"], r["n_events"], r["sum_value"], r["closed"]) for r in results] == [
            (1, 2, 15.0, False)
        ]
        # phase 2: the gap elapses -> timeout path emits closed=true and
        # frees the state (new data just keeps batches firing)
        _write_events(spark, src, [(2, 1.0, 102)])
        # the timeout can be serviced in an empty batch before key 2's file
        # is picked up — wait for BOTH emissions independently
        while time.time() < deadline and not (
            any(r["closed"] for r in results)
            and any(r["user_id"] == 2 for r in results)
        ):
            time.sleep(0.5)
        got = {(r["user_id"], r["closed"]): (r["n_events"], r["sum_value"]) for r in results}
        assert got[(1, True)] == (2, 15.0)
        assert got[(2, False)] == (1, 1.0)
        # phase 3: key 1 returns AFTER its state was removed -> fresh session
        _write_events(spark, src, [(1, 7.0, 103)])
        while time.time() < deadline and (1, False) not in {
            (r["user_id"], r["closed"]) for r in results if r["sum_value"] == 7.0
        }:
            time.sleep(0.5)
        fresh = [
            r for r in results
            if r["user_id"] == 1 and not r["closed"] and r["sum_value"] == 7.0
        ]
        assert fresh and fresh[0]["n_events"] == 1
    finally:
        q.stop()


def test_event_time_timer_closes_sessions(spark, tmp_path: Path):
    """transformWithState EVENT-TIME timers: a session closes when the
    watermark passes last-activity + gap — driven entirely by event
    timestamps (replay-stable), no wall-clock sleeps. Run 1 arms the timer;
    run 2 (same checkpoint) ships a much-later event for ANOTHER key, which
    advances the watermark past key 1's expiry and fires its timer in the
    no-data micro-batch."""
    from hubverse_transform_spark.streaming.stateful import (
        transform_with_state_session_expiry,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    def write(rows, mode="append"):
        df = spark.createDataFrame(rows, ["user_id", "value", "ts_s"]).select(
            F.col("user_id").cast("long"),
            F.col("value").cast("double"),
            F.timestamp_seconds("ts_s").alias("ts"),
        )
        df.coalesce(1).write.mode(mode).parquet(str(src))
        return df.schema

    def run(name):
        stream = spark.readStream.schema(schema).parquet(str(src))
        results: list = []
        q = (
            transform_with_state_session_expiry(stream, gap_ms=10_000)
            .writeStream.foreachBatch(lambda b, _i: results.extend(b.collect()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return results

    try:
        src, ckpt = tmp_path / "src", str(tmp_path / "ckpt")
        # key 1: two events 3s apart (one session, gap 10s)
        schema = write([(1, 10.0, 1000), (1, 5.0, 1003)])
        rows1 = run("tmr1")
        assert rows1 == []  # nothing closed yet: watermark at 1003s, timer at 1013s

        # key 2 far in the future -> watermark jumps past key 1's expiry
        write([(2, 1.0, 2000)])
        rows2 = run("tmr2")
        got = {r["user_id"]: r for r in rows2}
        assert 1 in got, f"key 1 session did not close: {rows2}"
        r = got[1]
        assert (r["n_events"], r["sum_value"]) == (2, 15.0)
        assert (r["start_ms"], r["end_ms"]) == (1000_000, 1003_000)
        assert 2 not in got  # key 2's own session is still open
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_map_state_counts_with_initial_state(spark, tmp_path: Path):
    """MapState per-category counters, warm-started from a batch aggregate
    via handleInitialState: stream increments land ON TOP of the seeded
    counts; keys present only in the seed emit nothing until they appear
    in a batch; state survives a checkpoint restart."""
    from hubverse_transform_spark.streaming.stateful import (
        transform_with_state_type_counts,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    def write(rows, mode="append"):
        df = spark.createDataFrame(rows, ["user_id", "event_type"]).select(
            F.col("user_id").cast("long"), F.col("event_type")
        )
        df.coalesce(1).write.mode(mode).parquet(str(src))
        return df.schema

    seed_rows = [(1, "click", 5), (3, "view", 2)]

    def run(name):
        seed = spark.createDataFrame(seed_rows, ["user_id", "event_type", "n"]).select(
            F.col("user_id").cast("long"), "event_type", F.col("n").cast("long")
        )
        stream = spark.readStream.schema(schema).parquet(str(src))
        results: list = []
        q = (
            transform_with_state_type_counts(stream, initial_state=seed)
            .writeStream.foreachBatch(lambda b, _i: results.extend(b.collect()))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return results

    try:
        src, ckpt = tmp_path / "src", str(tmp_path / "ckpt")
        schema = write([(1, "click"), (1, "purchase"), (1, "purchase"), (2, "view")])
        got = {r["user_id"]: r for r in run("ms1")}
        # user 1: seeded click:5 + batch click:1/purchase:2 -> top click 6 of 8
        assert (got[1]["n_types"], got[1]["n_events"]) == (2, 8)
        assert (got[1]["top_type"], got[1]["top_n"]) == ("click", 6)
        assert (got[2]["n_types"], got[2]["n_events"], got[2]["top_type"]) == (1, 1, "view")
        assert 3 not in got  # seed-only key emits nothing until it streams

        # restart from checkpoint: map persists; user 3 now appears and its
        # count sits on top of the SEEDED 2 (initial state applied once,
        # not re-applied on restart)
        write([(3, "view"), (1, "purchase")])
        got2 = {r["user_id"]: r for r in run("ms2")}
        assert (got2[3]["n_types"], got2[3]["n_events"], got2[3]["top_n"]) == (1, 3, 3)
        # user 1: purchase 2+1=3 vs click 6 -> click still top, 9 events
        assert (got2[1]["n_events"], got2[1]["top_type"], got2[1]["top_n"]) == (9, "click", 6)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
