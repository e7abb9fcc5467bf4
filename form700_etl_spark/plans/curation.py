"""Declarative curation pipelines: a YAML spec compiled to ONE Catalyst
plan AND to the equivalent DuckDB oracle SQL.

The reference drives its whole ETL from config tables (tables.csv
routes list columns, schema CSVs drive the cast pass —
/root/reference/Form700.py:249-256, 325-344); this module applies the
same config-driven design to the training-data surface: a data
engineer writes an ordered list of curation stages in YAML, and the
compiler emits

- a Spark DataFrame pipeline (every stage scan-side or one keyed
  shuffle — the compiler only composes shapes already proven by the
  standalone operators), and
- the equivalent ANSI SQL over layered CTEs, generated from the SAME
  spec — so the cross-engine oracle is not hand-mirrored per pipeline
  but derived, and a new pipeline config is oracle-checked for free.

Supported stages (each mirrors a standalone registered operator):

``min_tokens: N``            drop docs with fewer than N tokens
``chars_per_token: [lo,hi]`` C4-style gibberish/boilerplate band
``lang_keep: [en, ...]``     language allowlist
``exact_dedup: true``        md5 fingerprint, min-doc_id canonical
``split_keep: train``        deterministic md5 split (functions/splits.py)
``pack_budget: N``           greedy per-source N-token sequence packing

The audit output (per source: docs, tokens, packs) is intentionally
the same shape as training_pipeline_end_to_end so the two flagships
are comparable; the YAML default adds a language gate and different
thresholds to prove the stages really come from config.

Scale: identical to the hand-written pipeline — stages compose into
one lazy plan, nothing iterates, nothing collects.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.splits import TRAIN_MAX_H2, VAL_MAX_H2
from ..io import table

DEFAULT_SPEC_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "curation_default.yaml",
)

_KNOWN_STAGES = (
    "min_tokens",
    "chars_per_token",
    "lang_keep",
    "exact_dedup",
    "split_keep",
    "epoch_shard",
    "pack_budget",
)


def load_spec(path: str = DEFAULT_SPEC_PATH) -> dict[str, Any]:
    import yaml

    with open(path) as f:
        spec = yaml.safe_load(f)
    stages = spec.get("stages")
    if not isinstance(stages, list) or not stages:
        raise ValueError("curation spec needs a non-empty 'stages' list")
    for st in stages:
        if len(st) != 1 or next(iter(st)) not in _KNOWN_STAGES:
            raise ValueError(f"unknown curation stage {st!r}")
    return spec


def _split_pred_sql(keep: str) -> str:
    h2 = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)"
    if keep == "train":
        return f"{h2} < '{TRAIN_MAX_H2}'"
    if keep == "val":
        return f"{h2} >= '{TRAIN_MAX_H2}' AND {h2} < '{VAL_MAX_H2}'"
    if keep == "test":
        return f"{h2} >= '{VAL_MAX_H2}'"
    raise ValueError(f"unknown split {keep!r}")


def _split_pred_col(keep: str):
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    if keep == "train":
        return h2 < TRAIN_MAX_H2
    if keep == "val":
        return (h2 >= TRAIN_MAX_H2) & (h2 < VAL_MAX_H2)
    if keep == "test":
        return h2 >= VAL_MAX_H2
    raise ValueError(f"unknown split {keep!r}")


def compile_spark(spec: dict[str, Any]):
    """spec -> callable (spark, sf_dir) -> audit DataFrame."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = table(spark, sf_dir, "documents")
        toks = F.split("text", " ")
        df = d.select(
            "doc_id",
            "lang",
            "source",
            "text",
            F.size(toks).cast("long").alias("n_tokens"),
            (F.length("text").cast("double") / F.size(toks)).alias("cpt"),
        )
        pack_budget = None
        pack_key = "source"
        for st in spec["stages"]:
            (kind, arg), = st.items()
            if kind == "min_tokens":
                df = df.filter(F.col("n_tokens") >= int(arg))
            elif kind == "chars_per_token":
                lo, hi = arg
                df = df.filter(F.col("cpt").between(float(lo), float(hi)))
            elif kind == "lang_keep":
                df = df.filter(F.col("lang").isin(*[str(a) for a in arg]))
            elif kind == "exact_dedup" and arg:
                wdup = W.partitionBy(F.md5("text")).orderBy("doc_id")
                df = (
                    df.withColumn("__rk", F.row_number().over(wdup))
                    .filter(F.col("__rk") == 1)
                    .drop("__rk")
                )
            elif kind == "split_keep":
                df = df.filter(_split_pred_col(str(arg)))
            elif kind == "epoch_shard":
                # deterministic epoch shuffle + striped shard id (the
                # sample_epoch_shuffle_shards discipline): global
                # position via the two-pass partitioned rank, never an
                # empty-partition-spec window.  Downstream packing and
                # the audit re-key to the shard (training shards are
                # the parallel units a run reads).
                from ..operators.prefix import partitioned_prefix_sum

                epoch, shards = int(arg["epoch"]), int(arg["shards"])
                keyed = df.withColumn(
                    "__k",
                    F.md5(
                        F.concat_ws(
                            ":", F.lit(epoch), F.col("doc_id").cast("string")
                        )
                    ),
                )
                df = (
                    partitioned_prefix_sum(
                        keyed, ["__k", "doc_id"], rank_col="__pos"
                    )
                    .withColumn(
                        "shard",
                        ((F.col("__pos") - 1) % shards).cast("int"),
                    )
                    .drop("__k", "__pos")
                )
                pack_key = "shard"
            elif kind == "pack_budget":
                pack_budget = int(arg)
        if pack_budget is None:
            raise ValueError("spec must end with a pack_budget stage")
        packed = df.withColumn(
            "pack_id",
            F.expr(
                f"coalesce(sum(n_tokens) OVER (PARTITION BY {pack_key} "
                f"ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING "
                f"AND 1 PRECEDING), 0) div {pack_budget}"
            ),
        )
        return (
            packed.groupBy(pack_key)
            .agg(
                F.count_distinct("pack_id").alias("n_packs"),
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("total_tokens"),
            )
            .orderBy(pack_key)
        )

    return run


def compile_oracle(spec: dict[str, Any]) -> str:
    """spec -> equivalent DuckDB SQL (layered CTEs, one per stage)."""
    ctes = [
        (
            "s0",
            "SELECT doc_id, lang, source, text,"
            " CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,"
            " CAST(length(text) AS DOUBLE) / len(string_split(text, ' '))"
            "   AS cpt"
            " FROM documents",
        )
    ]
    prev = "s0"
    pack_budget = None
    pack_key = "source"
    for i, st in enumerate(spec["stages"], start=1):
        (kind, arg), = st.items()
        name = f"s{i}"
        if kind == "min_tokens":
            body = f"SELECT * FROM {prev} WHERE n_tokens >= {int(arg)}"
        elif kind == "chars_per_token":
            lo, hi = arg
            body = (
                f"SELECT * FROM {prev}"
                f" WHERE cpt BETWEEN {float(lo)} AND {float(hi)}"
            )
        elif kind == "lang_keep":
            langs = ", ".join(f"'{a}'" for a in arg)
            body = f"SELECT * FROM {prev} WHERE lang IN ({langs})"
        elif kind == "exact_dedup" and arg:
            body = (
                f"SELECT * EXCLUDE (__rk) FROM ("
                f"SELECT {prev}.*, row_number() OVER ("
                f"PARTITION BY md5(text) ORDER BY doc_id) AS __rk"
                f" FROM {prev}) WHERE __rk = 1"
            )
        elif kind == "split_keep":
            body = f"SELECT * FROM {prev} WHERE {_split_pred_sql(str(arg))}"
        elif kind == "epoch_shard":
            epoch, shards = int(arg["epoch"]), int(arg["shards"])
            body = (
                f"SELECT * EXCLUDE (__pos),"
                f" CAST((__pos - 1) % {shards} AS INT) AS shard FROM ("
                f"SELECT {prev}.*, row_number() OVER (ORDER BY"
                f" md5(CAST({epoch} AS VARCHAR) || ':' ||"
                f" CAST(doc_id AS VARCHAR)), doc_id) AS __pos"
                f" FROM {prev})"
            )
            pack_key = "shard"
        elif kind == "pack_budget":
            pack_budget = int(arg)
            continue
        else:
            raise ValueError(f"unknown curation stage {st!r}")
        ctes.append((name, body))
        prev = name
    if pack_budget is None:
        raise ValueError("spec must end with a pack_budget stage")
    ctes.append(
        (
            "packed",
            f"SELECT {pack_key}, n_tokens,"
            f" COALESCE(SUM(n_tokens) OVER (PARTITION BY {pack_key}"
            f" ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING"
            f" AND 1 PRECEDING), 0) // {pack_budget} AS pack_id"
            f" FROM {prev}",
        )
    )
    cte_sql = ",\n".join(f"{n} AS ({b})" for n, b in ctes)
    return (
        f"WITH {cte_sql}\n"
        f"SELECT {pack_key},"
        " CAST(COUNT(DISTINCT pack_id) AS BIGINT) AS n_packs,"
        " CAST(COUNT(*) AS BIGINT) AS n_docs,"
        " CAST(SUM(n_tokens) AS BIGINT) AS total_tokens"
        f" FROM packed GROUP BY {pack_key} ORDER BY {pack_key}"
    )
