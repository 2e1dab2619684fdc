"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]``; the same config block is what we would ship
to a 1000-executor cluster — AQE handles runtime re-planning (skew joins,
coalescing small shuffle partitions), Arrow makes pandas-UDF exchange cheap,
and shuffle partitions default to a value AQE can coalesce down from.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hubverse-transform-spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults.

    AQE is on: at 100 TB the static shuffle-partition count is always wrong for
    some stage, so we set a generous initial count and let AQE coalesce.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # --- adaptive execution: runtime coalescing + skew-join splitting ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # initial shuffle parallelism; AQE coalesces small stages down
        .config("spark.sql.shuffle.partitions", str(max(cpus, 32)))
        # --- broadcast: dims (region/nation/supplier at test SF) go map-side ---
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- Arrow for pandas UDF / toPandas exchange ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Python UDTFs also go Arrow-batched (BatchEvalPythonUDTF is the
        # row-pickling path; the plan audit bans BatchEvalPython* everywhere)
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        # parquet: vectorized reader on, sane split size for local disks
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "snappy")
        # timestamps in testdata are timestamp[ms]/[ns] without TZ; keep them stable
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # hive partition values stay strings: round_id is date-shaped but the
        # output schema policy types it string (ref integration goldens), and
        # silent str->date flips on lake read-back would break that parity
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        # managed (bucketed) tables land here, never in the repo working dir
        .config("spark.sql.warehouse.dir", os.environ.get(
            "SPARK_WAREHOUSE_DIR", "/tmp/hubverse-spark-warehouse"))
        .config("spark.ui.showConsoleProgress", "false")
        # parquet TIMESTAMP(NANOS) (events.ts) is rejected by default; read as
        # long nanos and convert in load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()


def table_path(sf_dir: str, name: str) -> str:
    """Path of one driver-generated parquet table under an sf dir."""
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one testdata table lazily (predicate/column pushdown preserved).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark only reads as a
    long (nanosAsLong) — convert to a microsecond timestamp with integer
    division (``div``, not ``/``: epoch-nanos exceed 2^53, double math would
    corrupt them). Truncation toward zero matches DuckDB's ns->us read.
    """
    from pyspark.sql import functions as F  # local import to avoid cycle

    # defensive: the caller may hand us a session built without this module's
    # factory (e.g. the driver harness). Both confs are runtime-settable and
    # required for correct reads: nanosAsLong or the TIMESTAMP(NANOS) column
    # in events.parquet fails the scan outright; UTC or date/window string
    # rendering shifts relative to the (timezone-naive) DuckDB oracle.
    for conf, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(conf, val)
        except Exception:  # pragma: no cover - conf locked by the host
            pass

    df = spark.read.parquet(table_path(sf_dir, name))
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.typeName() in ("long", "bigint"):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def spread_small_scan(df):
    """Ensure ``df`` has at least ``defaultParallelism`` partitions before an
    expensive per-row stage (regex shingling, HOF vector math).

    A small table often arrives as ONE parquet file below
    ``maxPartitionBytes`` — a single scan partition — which serializes any
    heavy map-side expression onto one task no matter how many cores exist
    (parquet can't split below the row group). The repartition moves only
    the (tiny) table itself; when the scan is already parallel (the 100 TB
    case: thousands of files) this is a no-op with zero added exchange.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
