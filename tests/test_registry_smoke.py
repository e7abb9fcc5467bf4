"""Analysis smoke over EVERY registered query.

Round-3 lesson: a fixture-encoding change (TIMESTAMP(NANOS) →
TIMESTAMP_NTZ in events.parquet) broke five queries with
AnalysisExceptions that nothing cheap surfaced — the bench crashed
mid-run and the correctness sample only caught one of the five.  This
test builds every registered query's DataFrame at sf0.001 and touches
its schema, so plan-time breakage (unresolved columns, illegal casts,
type mismatches) fails ONE fast test with a full list of broken
queries instead of detonating downstream.

Cost note: building a plan is analysis-only for the lazy queries
(milliseconds).  A handful of operators are eager by design
(localCheckpoint / count inside LSH and connected components) and the
five streaming queries drive a real micro-batch run — those are
excluded here because tests/test_streaming.py and the oracle suite
execute them for real; re-running them would make this smoke slow
without widening coverage.
"""

from __future__ import annotations

import pytest

from form700_etl_spark.registry import all_queries

# Queries whose *construction* executes jobs (streaming drives a full
# micro-batch run; LSH/components localCheckpoint+count eagerly).  Each
# is executed for real elsewhere: test_streaming.py and the oracle
# harness (test_oracle_queries.py) cover them end-to-end.
_EAGER = {
    "stream_tumbling_hourly",
    "stream_session_windows",
    "stream_stateful_user_stats",
    "stream_dedup_within_watermark",
    "stream_stream_click_purchase",
    "dedup_minhash_lsh",
    "dedup_clusters_connected",
    "ann_ivf_topk",
    "ann_pq_topk",
}


def test_every_registered_query_analyzes(spark, sf_dir):
    queries = all_queries()
    assert len(queries) >= 150  # the registry actually loaded
    failures: list[str] = []
    for name, q in sorted(queries.items()):
        if name in _EAGER:
            continue
        try:
            df = q.fn(spark, sf_dir)
            assert len(df.schema.fields) > 0
        except Exception as exc:  # collect ALL breakage, not just the first
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, "queries failing analysis:\n" + "\n".join(failures)


@pytest.mark.parametrize("name", sorted(_EAGER))
def test_eager_queries_are_covered_elsewhere(name):
    """Guard: every exclusion above still exists in the registry (a
    renamed query would silently drop out of the smoke's universe)."""
    assert name in all_queries()
