"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet fixtures, then compares: row count, column-name set, and
order-insensitive values.  Stricter than the driver in one way: we
demand exact equality on every cell (floats included) — the queries are
written for bit-identical cross-engine results, so any drift is a bug.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from form700_etl_spark.io import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify every cell so NULL/NaN/date/Decimal representations unify
    def cell(v):
        if v is None:
            return "<null>"
        if isinstance(v, float):
            if math.isnan(v):
                return "<null>"
            return repr(v)
        return str(v)

    out = df.map(cell)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def _negzero_columns(df: pd.DataFrame) -> list[str]:
    """Columns containing IEEE -0.0 — banned by the registry convention
    (registry.py docstring): any final rounded double that can reach
    exact zero from below must add ``+ 0.0`` on BOTH sides, because the
    engines disagree on the sign of a rounded tiny negative (the
    round-10 graph_modularity_lpa escape).  Making the rule mechanical:
    a -0.0 in EITHER engine's output means a missing guard, even when
    both sides happen to agree today."""
    bad = []
    for col in df.columns:
        for v in df[col]:
            if isinstance(v, float) and v == 0.0 and math.copysign(1.0, v) < 0:
                bad.append(col)
                break
    return bad


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> None:
    actual = spark_df.toPandas()
    expected = con.execute(sql).df()
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: column mismatch spark={sorted(actual.columns)} duckdb={sorted(expected.columns)}"
    )
    for side, df in (("spark", actual), ("duckdb", expected)):
        bad = _negzero_columns(df)
        assert not bad, (
            f"{name}: {side} emits -0.0 in {bad} — add '+ 0.0' after the "
            "final round on both sides (registry signed-zero convention)"
        )
    assert len(actual) == len(expected), (
        f"{name}: row count mismatch spark={len(actual)} duckdb={len(expected)}"
    )
    a = _normalize(actual)
    e = _normalize(expected)
    if not a.equals(e):
        diff_mask = (a != e).any(axis=1)
        sample = pd.concat(
            {"spark": a[diff_mask].head(5), "duckdb": e[diff_mask].head(5)}, axis=1
        )
        raise AssertionError(f"{name}: value mismatch, first differing rows:\n{sample}")
