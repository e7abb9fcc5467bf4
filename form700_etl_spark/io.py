"""Test-table loaders.

The driver fixtures (TESTDATA.md) are one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}``.  Loading goes through
``spark.read.parquet`` so Catalyst gets predicate pushdown, column
pruning and partition-sized splits for free — at 100 TB these would be
directories of many row-grouped files and the same code holds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"
ORACLE_SF_DIR = "/root/testdata/sf0.01"


def ensure_session_confs(spark: SparkSession) -> None:
    """Make the engine's semantics independent of who built the
    SparkSession (the harness driver builds its own): these are
    runtime-settable SQL confs, applied idempotently on every table
    access.

    - nanosAsLong: events.parquet carries TIMESTAMP(NANOS), which the
      parquet reader otherwise rejects outright;
    - UTC session timezone: timestamp rendering must match the
      UTC-naive DuckDB oracle;
    - AQE on: runtime coalesce + skew handling (Spark 4 default, pinned).
    """
    for key, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
    ):
        if spark.conf.get(key, None) != value:
            spark.conf.set(key, value)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = df.withColumn("ts", normalize_ts(df.schema["ts"].dataType))
    return df


def normalize_ts(dtype, col: str = "ts"):
    """Normalize the events ``ts`` column to a session-TZ ``TIMESTAMP``
    regardless of how the fixture parquet encodes it.  The engine pins the
    session timezone to UTC (ensure_session_confs), so every encoding maps
    to the same instants the UTC-naive DuckDB oracle sees:

    - ``TIMESTAMP(NANOS)`` surfaces as int64 nanos under
      legacy.parquet.nanosAsLong → truncate to micros (DuckDB's read
      behavior for nanosecond parquet timestamps);
    - ``timestamp[us]`` with no timezone surfaces as ``TIMESTAMP_NTZ``
      (PySpark 4.x) → cast to TIMESTAMP, which interprets the wall-clock
      value in the UTC session zone, i.e. values are unchanged;
    - already ``TIMESTAMP`` → passthrough.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if isinstance(dtype, LongType):
        return F.timestamp_micros(F.expr(f"{col} div 1000"))
    if isinstance(dtype, TimestampNTZType):
        return F.col(col).cast("timestamp")
    return F.col(col)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register each fixture table as a temp view (the engine's catalog —
    the Spark analog of the reference's dict-of-DataFrames, SURVEY §1.1)."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


# ------------------------------------------------------- broadcast hinting

# Forced-broadcast ceiling for maybe_broadcast, in bytes of Catalyst's
# own plan-size estimate.  Runtime-settable SQL conf so a deployment (or
# a test) can tighten/disable hinting without code changes; <= 0 turns
# hinting off entirely and leaves the strategy to AQE.
BROADCAST_HINT_CONF = "spark.graft.broadcastHintMaxBytes"
DEFAULT_BROADCAST_HINT_MAX_BYTES = 256 * 1024 * 1024


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate for the optimized subplan — no
    job is run; the estimate comes from file sizes and column stats,
    which is exactly the signal the planner itself would use."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()  # noqa: SLF001
    return int(stats.sizeInBytes().toString())


def maybe_broadcast(df: DataFrame) -> DataFrame:
    """Size-aware broadcast hint for join sides that are dimension-LIKE
    but scale with the corpus (customer/supplier/part grow with SF;
    nation/region do not and may hint unconditionally).

    A hard ``F.broadcast()`` on an SF-scaling table is the inverse of
    the small-side-not-broadcast anti-pattern: correct at sf0.1, a
    driver/executor OOM at the 100 TB design point.  This helper applies
    the hint only while Catalyst's own size estimate stays under
    ``spark.graft.broadcastHintMaxBytes`` (default 256 MiB); above the
    bound — or when the conf is set <= 0 — the frame is returned
    unhinted and AQE picks the strategy at runtime from true sizes.
    """
    spark = df.sparkSession
    try:
        limit = int(spark.conf.get(BROADCAST_HINT_CONF, str(DEFAULT_BROADCAST_HINT_MAX_BYTES)))
    except ValueError:
        limit = DEFAULT_BROADCAST_HINT_MAX_BYTES
    if limit <= 0:
        return df
    try:
        size = plan_size_bytes(df)
    except Exception:
        return df  # estimate unavailable (e.g. Spark Connect) — defer to AQE
    from pyspark.sql import functions as F

    return F.broadcast(df) if size <= limit else df


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the cluster's default parallelism
    when the frame arrives with fewer partitions.  Per-row compute that
    runs ON a frame's own tasks (a broadcast join's probe side, an
    Arrow scoring pass) serializes if the scan produced 1-2 splits — a
    local small-file artifact; at 100 TB the scan already has thousands
    of splits and this is a no-op."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        return df.repartition(parallelism)
    return df
