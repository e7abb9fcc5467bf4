"""Operational robustness: schema evolution and corrupt-input
tolerance — the two failure modes a long-lived 100 TB table actually
hits (writers upgrade, files truncate) that the fixture suite never
exercises."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from form700_etl_spark.io import table


def test_schema_evolution_merge_read(spark, sf_dir, tmp_path):
    """v1 files lack a column later writers added: a mergeSchema read
    unifies them, backfilling nulls — no rewrite of old data."""
    path = str(tmp_path / "t")
    e = table(spark, sf_dir, "events").select("event_id", "user_id")
    e.limit(100).write.parquet(os.path.join(path, "batch=1"))
    e2 = table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("value").alias("score")
    )
    e2.limit(50).write.parquet(os.path.join(path, "batch=2"))

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) >= {"event_id", "user_id", "score"}
    assert merged.count() == 150
    # old files surface the new column as null
    assert merged.filter(F.col("score").isNull()).count() == 100


def test_corrupt_file_is_skippable_not_fatal(spark, sf_dir, tmp_path):
    """With ignoreCorruptFiles the scan survives a truncated file and
    returns the healthy rows; without it the corruption is a hard
    error (the default — silence must be opt-in)."""
    import pytest

    path = str(tmp_path / "t")
    e = table(spark, sf_dir, "events").select("event_id", "user_id")
    e.limit(100).repartition(4).write.parquet(path)
    victim = sorted(glob.glob(os.path.join(path, "part-*.parquet")))[0]
    with open(victim, "r+b") as f:
        f.truncate(32)  # destroy footer

    with pytest.raises(Exception):
        spark.read.parquet(path).count()  # footer read already fatal

    # ignoreCorruptFiles governs the SCAN; schema inference still reads
    # every footer on the driver, so the tolerant read supplies the
    # table schema explicitly — which a production catalog does anyway.
    old = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        n = spark.read.schema(e.schema).parquet(path).count()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", old)
    assert 0 < n < 100
