"""Skew-handling operators: salting for hot keys (100 TB design).

AQE's skew-join split handles most runtime skew; explicit salting is
the declarative fallback when a handful of keys dominate (stop-phrase
shingles, null-heavy join keys, power-law user ids).

``salted_aggregate`` runs the classic two-phase plan: group on
(key, salt) with map-side partials spread across ``n_salts`` reducers,
then merge the partials per key.  Results are EXACTLY equal to the
direct aggregate for decomposable aggregates (sum/count/min/max) —
which makes it oracle-checkable against the plain GROUP BY.

``salted_broadcast_left_join`` replicates a small dimension ``n_salts``
times so a skewed fact side spreads its hot keys across reducers when
a shuffle join is unavoidable; with a broadcastable dim it degrades
gracefully to a plain broadcast join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, deterministic_col: str | Column | None = None) -> DataFrame:
    """Add a ``__salt`` column in [0, n_salts).  Salting by a hash of an
    existing unique column keeps runs deterministic (preferred for
    reproducible pipelines); falls back to a random salt."""
    if deterministic_col is not None:
        c = F.col(deterministic_col) if isinstance(deterministic_col, str) else deterministic_col
        salt = F.pmod(F.xxhash64(c), F.lit(n_salts))
    else:
        salt = (F.rand() * n_salts).cast("int")
    return df.withColumn("__salt", salt.cast("int"))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (input expr, fn) with fn in
    {sum, count, min, max}.  Phase 1 groups on (keys + salt) so a hot
    key's rows land on ``n_salts`` reducers; phase 2 merges partials.
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    firsts = {"sum": F.sum, "count": lambda c: F.count(c), "min": F.min, "max": F.max}
    for name, (_, fn) in aggs.items():
        if fn not in mergers:
            raise ValueError(f"{fn!r} is not decomposable; salted_aggregate supports {sorted(mergers)}")
    salted = with_salt(df, n_salts, deterministic_col=salt_source)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[firsts[fn](expr).alias(f"__p_{name}") for name, (expr, fn) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[mergers[fn](F.col(f"__p_{name}")).alias(name) for name, (expr, fn) in aggs.items()]
    )


def salted_broadcast_left_join(
    fact: DataFrame, dim: DataFrame, key: str, n_salts: int = 8, salt_source: str | None = None
) -> DataFrame:
    """Skew-safe left join: fact rows get a salt, the dim replicates
    across all salt values, and the join key becomes (key, salt)."""
    salted_fact = with_salt(fact, n_salts, deterministic_col=salt_source)
    salts = fact.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
    exploded_dim = dim.crossJoin(F.broadcast(salts))
    return salted_fact.join(exploded_dim, [key, "__salt"], "left").drop("__salt")
