"""Small-file compaction sink (sinks/compaction.py)."""

from __future__ import annotations

import glob
import os

import pytest

from form700_etl_spark.io import table
from form700_etl_spark.sinks.compaction import CompactionReport, compact_parquet_dir


def _write_small_files(spark, sf_dir, path: str, n_files: int) -> int:
    df = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return df.count()


def test_compacts_to_target_and_preserves_rows(spark, sf_dir, tmp_path):
    path = str(tmp_path / "t")
    n_rows = _write_small_files(spark, sf_dir, path, 32)
    assert len(glob.glob(os.path.join(path, "part-*.parquet"))) == 32
    report = compact_parquet_dir(spark, path, target_bytes=1 << 30)
    assert report.compacted and report.files_before == 32 and report.files_after == 1
    assert report.rows == n_rows
    assert spark.read.parquet(path).count() == n_rows
    # no leftover tmp/bak
    assert not os.path.exists(path + ".compact-tmp")
    assert not os.path.exists(path + ".compact-bak")


def test_already_compact_is_metadata_only_noop(spark, sf_dir, tmp_path):
    path = str(tmp_path / "t")
    _write_small_files(spark, sf_dir, path, 1)
    report = compact_parquet_dir(spark, path, target_bytes=1 << 30)
    assert report == CompactionReport(path, 1, 1, report.bytes_total, -1, False)


def test_sorted_compaction_clusters_files(spark, sf_dir, tmp_path):
    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    _write_small_files(spark, sf_dir, path, 16)
    # tiny target -> several output files, range-clustered on user_id
    report = compact_parquet_dir(spark, path, target_bytes=16 * 1024, sort_by=["user_id"])
    assert report.compacted and 1 < report.files_after < 16
    ranges = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.read_metadata(f)
        names = md.schema.to_arrow_schema().names
        ci = names.index("user_id")
        st = md.row_group(0).column(ci).statistics
        lo, hi = st.min, st.max
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(ci).statistics
            lo, hi = min(lo, s.min), max(hi, s.max)
        ranges.append((lo, hi))
    # range partitioning -> files ordered by key, non-overlapping interiors
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_verify_failure_leaves_source_untouched(spark, sf_dir, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    n_rows = _write_small_files(spark, sf_dir, path, 8)
    import form700_etl_spark.sinks.compaction as mod

    real_read = spark.read.parquet

    class FakeReader:
        def parquet(self, p):
            df = real_read(p)
            return df.limit(5) if p.endswith(".compact-tmp") else df

    monkeypatch.setattr(
        type(spark), "read", property(lambda self: FakeReader()), raising=False
    )
    with pytest.raises(RuntimeError, match="row-count mismatch"):
        mod.compact_parquet_dir(spark, path, target_bytes=1 << 30)
    monkeypatch.undo()
    assert spark.read.parquet(path).count() == n_rows
    assert not os.path.exists(path + ".compact-tmp")


def test_streaming_append_then_compact(spark, sf_dir, tmp_path):
    """The motivating workflow: micro-batch appends leave many small
    files; compaction consolidates them without changing the row set."""
    from form700_etl_spark.streaming.events_stream import read_events_stream

    out = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    events = read_events_stream(spark, sf_dir).select("event_id", "user_id", "value")
    q = (
        events.writeStream.foreachBatch(
            lambda df, bid: df.repartition(8).write.mode("append").parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_before = spark.read.parquet(out).count()
    assert len(glob.glob(os.path.join(out, "part-*.parquet"))) >= 8
    report = compact_parquet_dir(spark, out, target_bytes=1 << 30)
    assert report.compacted and report.files_after == 1
    assert spark.read.parquet(out).count() == n_before
