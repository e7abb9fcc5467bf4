"""Z-order layout: bit-identical keys are covered by the oracle suite;
here we prove the LAYOUT CLAIM — a Morton-clustered file set skips 2-D
box predicates that a single-column-sorted layout cannot — by reading
the actual parquet min-max statistics both layouts produce.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from form700_etl_spark.io import table
from form700_etl_spark.operators.zorder import zorder_key_sql, zorder_write

N_FILES = 8


def _file_stats(path: str, cols: list[str]) -> list[dict[str, tuple]]:
    out = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.read_metadata(f)
        schema_names = md.schema.to_arrow_schema().names
        mins: dict[str, object] = {}
        maxs: dict[str, object] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                name = schema_names[ci]
                if name not in cols:
                    continue
                st = md.row_group(rg).column(ci).statistics
                assert st is not None and st.has_min_max
                mins[name] = st.min if name not in mins else min(mins[name], st.min)
                maxs[name] = st.max if name not in maxs else max(maxs[name], st.max)
        out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def _files_overlapping(stats, col: str, lo, hi) -> int:
    return sum(1 for s in stats if not (s[col][1] < lo or s[col][0] > hi))


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    e = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    sorted_path = str(base / "by_user")
    z_path = str(base / "zorder")
    # layout A: classic single-column sort (skips user_id only)
    (
        e.repartitionByRange(N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(sorted_path)
    )
    # layout B: Morton clustering on (user_id, value-cents)
    zorder_write(e, ["user_id", "CAST(round(value * 100) AS BIGINT)"], z_path, N_FILES)
    return sorted_path, z_path


def test_zorder_skips_value_dimension(spark, layouts):
    """A narrow predicate on the SECOND dimension: the user_id-sorted
    layout has near-full value ranges in every file (no skipping); the
    z-ordered layout must allow skipping at least one file — and in
    practice most."""
    sorted_path, z_path = layouts
    lo, hi = 10.0, 30.0
    s_stats = _file_stats(sorted_path, ["value"])
    z_stats = _file_stats(z_path, ["value"])
    s_hit = _files_overlapping(s_stats, "value", lo, hi)
    z_hit = _files_overlapping(z_stats, "value", lo, hi)
    assert len(s_stats) == len(z_stats) == N_FILES
    assert z_hit < s_hit, (s_stats, z_stats)


def test_zorder_layout_returns_identical_rows(spark, layouts):
    """Layout never changes answers: the same box filter over both
    layouts returns the same row set."""
    sorted_path, z_path = layouts
    pred = (F.col("user_id") <= 5) & F.col("value").between(10.0, 30.0)
    a = {r.event_id for r in spark.read.parquet(sorted_path).filter(pred).collect()}
    b = {r.event_id for r in spark.read.parquet(z_path).filter(pred).collect()}
    assert a == b and a


def test_zorder_key_budget_guard():
    with pytest.raises(ValueError):
        zorder_key_sql(["a", "b", "c", "d"], bits=16)
