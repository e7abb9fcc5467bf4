"""Bloom-filter semi-join pruning (runtime join filter).

The 100 TB regime this targets: a fact-side shuffle join against a
filtered dimension whose distinct keys are too numerous to broadcast
exactly, but whose *bitmap* fits in a few kilobytes.  Building a Bloom
filter over the dimension keys and probing it on the fact side BEFORE
the shuffle removes most non-matching fact rows from the exchange —
the same idea as Spark's own InjectRuntimeFilter rule
(`spark.sql.optimizer.runtime.bloomFilter.*`), exposed here as an
explicit, plan-inspectable operator (`might_contain` is not public
SQL, so the bitmap and probes are built from public expressions).

Scale design:

- the bitmap never touches the driver: the build side aggregates
  (position -> 64-bit word) pairs into a ONE-ROW sparse
  ``map<int,bigint>`` DataFrame that is broadcast to the probe side
  (a 1-row broadcast nested-loop join = a shared JVM-side variable);
- the build is one distinct + one aggregation over the dimension's
  keys only (column-pruned scan);
- probes are pure JVM expressions (xxhash64 + shift/mask), inside
  whole-stage codegen, evaluated before the fact-side Exchange;
- false positives are harmless by construction — callers ALWAYS run
  the exact join afterwards; the filter only thins the shuffle.

With k independent hash probes over m bits and n distinct build keys,
the false-positive rate is ~(1 - e^(-kn/m))^k; the defaults
(m = 2^20 bits = 128 KiB, k = 4) hold fpp < 1% out to ~n = 10^5 and
degrade gracefully (never incorrectly) beyond.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 4

_BM_COL = "__bloom_bitmap"


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k independent bit positions for a key: xxhash64 seeded per probe,
    reduced mod m.  xxhash64 is a public Spark function with a seed
    parameter, so the probe family needs no UDF."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)).cast("long")
        for i in range(k)
    ]


def bloom_build(dim: DataFrame, dim_key: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K) -> DataFrame:
    """Build the Bloom bitmap for ``dim[dim_key]`` as a ONE-ROW
    DataFrame with a single ``map<int,bigint>`` column (word index ->
    64-bit word, zero words absent).  Stays distributed end-to-end:
    explode k positions per key -> distinct -> per-word bit_or -> one
    map_from_entries row.  The final single-reducer step sees at most
    m/64 rows (16 384 at the default m) — bounded by the filter size,
    not the data.
    """
    pos = dim.select(
        F.explode(F.array(*_positions(F.col(dim_key), m_bits, k))).alias("pos")
    ).distinct()
    # shiftleft's bit-count arg must be a literal in the Python API, so
    # the variable-shift word assembly goes through SQL expressions.
    words = pos.select(
        (F.col("pos") / F.lit(64)).cast("int").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
    ).groupBy("word_idx").agg(F.bit_or("bit").alias("word"))
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "word"))).alias(_BM_COL)
    )


def bloom_probe_condition(key_sql: str, m_bits: int, k: int) -> Column:
    """AND of the k bit probes against the broadcast bitmap column.
    ``key_sql`` is a SQL expression for the probe key (shift amounts are
    data-dependent, which the Python shift APIs don't accept)."""
    cond = F.lit(True)
    for i in range(k):
        pos = f"pmod(xxhash64(({key_sql}), {i}), {m_bits})"
        word = f"coalesce(element_at({_BM_COL}, CAST(({pos}) DIV 64 AS INT)), CAST(0 AS BIGINT))"
        probe = f"(shiftrightunsigned({word}, CAST(({pos}) % 64 AS INT)) & 1) = 1"
        cond = cond & F.expr(probe)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Thin ``fact`` to (a conservative superset of) the rows whose
    ``fact_key`` appears in ``dim[dim_key]``.  No false negatives:
    every matching row survives; a bounded fraction of non-matching
    rows leak through and are eliminated by the exact join the caller
    runs next.  The probe filter sits BEFORE the fact side's Exchange,
    which is the entire point at 100 TB: the shuffle moves only
    (matches + fpp · non-matches) instead of the whole fact table.
    """
    bitmap = bloom_build(dim, dim_key, m_bits, k)
    probed = fact.join(F.broadcast(bitmap))  # 1-row broadcast: a JVM-shared bitmap
    return probed.filter(bloom_probe_condition(fact_key, m_bits, k)).drop(_BM_COL)
