"""Query registry: the driver-facing surface.

Every implemented operator gets a named entry: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an ANSI
SQL oracle that DuckDB runs on the same parquet tables.  The driver
hash-compares the two result sets (row count + schema + order-
insensitive value hash), so queries are written for *bit-identical*
cross-engine results:

- money doubles are converted to integer cents (``round(x*100)`` →
  BIGINT) and aggregated exactly; division back to double happens once
  at the end (bigint→double is exact below 2^53, and the final IEEE
  division is identical in both engines);
- ratio outputs are rounded to a fixed number of decimals;
- any final rounded double that can reach exact zero from below adds
  ``+ 0.0`` after the round on BOTH sides: DuckDB's ``round`` emits
  IEEE ``-0.0`` for tiny negatives where Spark emits ``+0.0`` —
  numerically equal but distinct under the driver's value hash (the
  round-10 ``graph_modularity_lpa`` escape);
- the rounding grain must stay well above the double spacing at the
  output's magnitude: ``round(x, 6)`` on a ~1e10 value asks for more
  precision than the double carries, and the two engines' rounding
  implementations disagree by one ulp exactly there (the round-11
  ``stats_deming_regression`` intercept) — outputs that grow past ~1e9
  emit integer units (``CAST(round(x) AS BIGINT)``) instead;
- timestamps are returned as formatted strings or DATEs, never raw;
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: SparkFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    def wrap(fn: SparkFn) -> SparkFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def _load_all() -> None:
    # Import for registration side effects.
    from .queries import (  # noqa: F401
        advanced,
        dedup,
        events,
        geo,
        mlprep,
        multimodal,
        pipeline_ops,
        recsys,
        refparity,
        relational,
        scale,
        similarity,
        sqlapi,
        streams,
        textops,
        timeseries,
        windows,
    )


def all_queries() -> dict[str, Query]:
    _load_all()
    return dict(_REGISTRY)


def spark_queries() -> dict[str, SparkFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
