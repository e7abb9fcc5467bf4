"""MERGE / upsert / SCD2 emulation (build plan M3; guide 'CDC / SCD2').

No Delta/Iceberg jars in this image, so MERGE INTO is emulated with
pure DataFrame algebra — the classic pattern:

- ``merge_upsert``: updated rows replace matched target rows, unmatched
  source rows insert (anti-join + union).  Equivalent SQL is a full
  outer join with source-wins COALESCE, which makes it oracle-checkable.
- ``scd2_apply``: slowly-changing-dimension type 2 — matched rows close
  their current version (valid_to = change date) and a new open version
  appends; history is preserved.

Scale notes: both are one shuffle on the merge key.  On a real
lakehouse table the same logic runs inside ``MERGE INTO`` (Delta) —
these operators keep the semantics available on plain parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """UPSERT: source rows win on key match; unmatched target rows kept."""
    kept_target = target.join(source.select(key), key, "left_anti")
    return kept_target.unionByName(source)


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key: str,
    change_date_col: str = "change_date",
    open_marker: str = "9999-12-31",
) -> DataFrame:
    """SCD type 2: ``current`` carries (key, attrs..., valid_from,
    valid_to) with open rows at ``open_marker``; ``changes`` carries
    (key, attrs..., change_date).  Matched open rows close at the
    change date; every change inserts a new open version."""
    chg_keys = changes.select(key, F.col(change_date_col))
    closed = (
        current.join(F.broadcast(chg_keys), key, "left")
        .withColumn(
            "valid_to",
            F.when(
                (F.col("valid_to") == open_marker) & F.col(change_date_col).isNotNull(),
                F.col(change_date_col),
            ).otherwise(F.col("valid_to")),
        )
        .drop(change_date_col)
    )
    new_versions = changes.select(
        *[c for c in current.columns if c not in ("valid_from", "valid_to")],
        F.col(change_date_col).alias("valid_from"),
        F.lit(open_marker).alias("valid_to"),
    )
    return closed.unionByName(new_versions)


def table_diff(old: DataFrame, new: DataFrame, key: str, hash_col: str = "__row_hash") -> DataFrame:
    """Snapshot reconciliation (CDC-style diff): classify every key as
    added / removed / changed / unchanged between two table versions by
    comparing a caller-supplied row fingerprint column ``hash_col``
    (callers build it from engine-portable string renderings — integer
    cents, ISO dates — so the same fingerprint is computable in any
    engine).  One full outer join on the key; at 100 TB both sides
    would be bucketed on the key so the join is exchange-free, and the
    fingerprint comparison avoids comparing every column pairwise."""
    o = old.select(F.col(key), F.col(hash_col).alias("__h_old"))
    n = new.select(F.col(key), F.col(hash_col).alias("__h_new"))
    joined = o.join(n, key, "full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), "added")
        .when(F.col("__h_new").isNull(), "removed")
        .when(F.col("__h_old") != F.col("__h_new"), "changed")
        .otherwise("unchanged")
    )
    return joined.select(F.col(key), status.alias("status"))
