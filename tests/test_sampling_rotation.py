"""Locks the driver-sample ordering in __spark_entry__ (rotation v2).

Round 11 drained the never-sampled pool, so the old "never-sampled
first" comparator degenerated to registration order and the driver
would have re-checked the same 50-query prefix forever.  Rotation v2
orders by (1) QUEUE_REVERIFY.txt post-fix priority, (2) last-sampled
driver round ascending, tie-broken by registration order.  These tests
exercise the pure helpers against synthetic artifacts AND assert the
real repo state yields the intended round-12 sample.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _load_adapter():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


adapter = _load_adapter()


# ---------------------------------------------------------------- synthetic


def _write_artifacts(tmp_path, samples: dict[int, list[str]]):
    for rnd, names in samples.items():
        payload = {n: {"hash_match": True} for n in names}
        (tmp_path / f"CORRECTNESS_r{rnd}.json").write_text(json.dumps(payload))


def test_lrs_orders_by_last_round_then_registration(tmp_path, monkeypatch):
    _write_artifacts(tmp_path, {1: ["a", "c"], 2: ["c", "d"]})
    last = adapter._last_sampled_rounds(str(tmp_path))
    assert last == {"a": 1, "c": 2, "d": 2}
    monkeypatch.setattr(
        adapter.os.path, "dirname", lambda p: str(tmp_path), raising=True
    )
    # registration order: b never sampled (round 0) -> first; then a (r1);
    # then c,d (r2) in registration order.
    assert adapter._least_recently_sampled_first(["a", "b", "c", "d"]) == [
        "b",
        "a",
        "c",
        "d",
    ]


def test_reverify_priority_is_self_clearing(tmp_path):
    _write_artifacts(tmp_path, {10: ["x"], 12: ["y"]})
    (tmp_path / "QUEUE_REVERIFY.txt").write_text("x\t11\ny\t11\nzzz not-an-int\n")
    last = adapter._last_sampled_rounds(str(tmp_path))
    # x last sampled r10 <= fixed_round 11 -> still awaiting re-verify;
    # y last sampled r12 > 11 -> priority cleared; malformed line ignored.
    assert adapter._reverify_priority(str(tmp_path), last) == ["x"]


def test_priority_names_lead_and_rest_stay_lrs(tmp_path, monkeypatch):
    _write_artifacts(tmp_path, {5: ["p", "q"], 9: ["r"]})
    (tmp_path / "QUEUE_REVERIFY.txt").write_text("r\t9\nmissing\t9\n")
    monkeypatch.setattr(
        adapter.os.path, "dirname", lambda p: str(tmp_path), raising=True
    )
    # r has priority (fixed in r9, last sampled r9 -> still <= fixed_round);
    # "missing" is not registered and must be dropped; p,q follow by LRS.
    assert adapter._least_recently_sampled_first(["p", "q", "r"]) == ["r", "p", "q"]


# ------------------------------------------------------------- real repo


def test_round12_sample_leads_with_fixed_queries():
    """The two queries fixed in round 11 AFTER their last driver sample
    (graph_modularity_lpa r10, stats_deming_regression r6) must lead the
    round-12 sample, followed by the stalest names."""
    if not os.path.exists(os.path.join(REPO, "CORRECTNESS_r11.json")):
        pytest.skip("driver artifacts not present")
    sys.path.insert(0, REPO)
    from form700_etl_spark.registry import oracle_sqls

    names = adapter._least_recently_sampled_first(list(oracle_sqls()))
    assert names[0] == "graph_modularity_lpa"
    assert names[1] == "stats_deming_regression"
    last = adapter._last_sampled_rounds(REPO)
    tail_rounds = [last.get(n, 0) for n in names[2:50]]
    # the rest of the 50-sample is strictly the stalest of the registry
    rest_sorted = sorted(last.get(n, 0) for n in names[2:])
    assert tail_rounds == rest_sorted[:48]
