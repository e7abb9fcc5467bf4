"""Tests for the declarative curation compiler (plans/curation.py).

The registered query checks the committed YAML; these check the
COMPILER — spec validation, and that a *different* spec still produces
engine-identical Spark and generated-SQL results (the property that
makes new pipeline configs oracle-checked for free).
"""

from __future__ import annotations

import pytest

from form700_etl_spark.plans.curation import (
    DEFAULT_SPEC_PATH,
    compile_oracle,
    compile_spark,
    load_spec,
)
from tests.oracle_harness import compare


def test_default_spec_loads(tmp_path):
    spec = load_spec(DEFAULT_SPEC_PATH)
    assert spec["stages"][-1] == {"pack_budget": 256}


def test_unknown_stage_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("stages:\n  - frobnicate: 3\n")
    with pytest.raises(ValueError, match="unknown curation stage"):
        load_spec(str(p))


def test_empty_stages_rejected(tmp_path):
    p = tmp_path / "empty.yaml"
    p.write_text("stages: []\n")
    with pytest.raises(ValueError, match="non-empty"):
        load_spec(str(p))


def test_missing_pack_budget_rejected(spark, sf_dir):
    spec = {"stages": [{"min_tokens": 10}]}
    with pytest.raises(ValueError, match="pack_budget"):
        compile_spark(spec)(spark, sf_dir)
    with pytest.raises(ValueError, match="pack_budget"):
        compile_oracle(spec)


def test_alternate_spec_compiles_engine_identical(spark, sf_dir, oracle_con):
    """A spec the repo does NOT commit (different thresholds, val split,
    no dedup, different budget) must still hash-match its generated SQL
    — the compiler property, not the fixture instance."""
    spec = {
        "stages": [
            {"min_tokens": 10},
            {"lang_keep": ["en", "zh"]},
            {"split_keep": "val"},
            {"pack_budget": 128},
        ]
    }
    compare(
        compile_spark(spec)(spark, sf_dir),
        oracle_con,
        compile_oracle(spec),
        "curation-alternate-spec",
    )


def test_stage_order_matters(spark, sf_dir):
    """Dedup-before-split and split-before-dedup are different pipelines
    (a duplicate pair straddling the split boundary survives one and
    not the other); the compiler must respect declared order, so the
    two orderings' audits may differ while each matches its own SQL."""
    base = [{"min_tokens": 5}, {"pack_budget": 64}]
    a = {"stages": [base[0], {"exact_dedup": True}, {"split_keep": "train"}, base[1]]}
    b = {"stages": [base[0], {"split_keep": "train"}, {"exact_dedup": True}, base[1]]}
    ra = compile_spark(a)(spark, sf_dir).collect()
    rb = compile_spark(b)(spark, sf_dir).collect()
    # both well-formed; equality of totals is NOT asserted — only that
    # each side agrees with its own generated oracle (checked via the
    # alternate-spec test pattern above for a) — here we just pin that
    # order produces a deterministic result object
    assert ra == compile_spark(a)(spark, sf_dir).collect()
    assert rb == compile_spark(b)(spark, sf_dir).collect()


def test_epoch_shard_stage_compiles_engine_identical(spark, sf_dir, oracle_con):
    """An UNCOMMITTED spec with the epoch_shard stage at a different
    epoch/shard count must hash-match its generated SQL — the compiler
    property for the round-14 stage, not the committed YAML instance."""
    spec = {
        "stages": [
            {"min_tokens": 10},
            {"epoch_shard": {"epoch": 3, "shards": 5}},
            {"pack_budget": 128},
        ]
    }
    compare(
        compile_spark(spec)(spark, sf_dir),
        oracle_con,
        compile_oracle(spec),
        "curation-epoch-shard-spec",
    )


def test_epoch_shard_rekeying_epoch_changes_permutation(spark, sf_dir):
    """Different epochs must yield different shard assignments (an
    independent permutation per epoch) while keeping every shard
    non-empty — the property a multi-epoch training run relies on."""
    base = [{"min_tokens": 10}, {"pack_budget": 128}]
    runs = {}
    for epoch in (1, 2):
        spec = {
            "stages": base[:1]
            + [{"epoch_shard": {"epoch": epoch, "shards": 4}}]
            + base[1:]
        }
        rows = compile_spark(spec)(spark, sf_dir).collect()
        runs[epoch] = {r.shard: (r.n_docs, r.total_tokens) for r in rows}
        assert sorted(runs[epoch]) == [0, 1, 2, 3], rows
    # striped assignment keeps per-shard doc counts near-equal within
    # each epoch, but the token totals must differ between epochs
    # (different permutation -> different docs per shard)
    assert runs[1] != runs[2], runs
