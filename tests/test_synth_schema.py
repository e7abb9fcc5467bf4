"""Schema pin for the SQL-string-rendered synthetic filings source.

Round 15 rewrote ``synthesize_filings`` from per-field Column
composition to rendered SQL strings (one ``F.expr``/``selectExpr``
parse per output column) to cut fresh-JVM plan-construction cost.  The
rewrite was verified row- and schema-identical against the former
Column-API construction at swap time; this golden pins the full nested
schema (names, order, types, nullability — struct field ORDER matters:
``sort_array`` over the schedule structs compares fields left to
right, so a reordered field silently changes array order and every
downstream oracle).  The VALUES stay pinned by the 25 ref_* DuckDB
oracle queries, cell-exact at sf0.01 and sf0.1.

If a schema change is ever intentional, regenerate the golden with the
snippet in this file's history and re-certify the ref_* oracles at
both SFs first.
"""

from __future__ import annotations

import json
import os

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "filings_schema.json")


def test_synthesized_filings_schema_matches_golden(spark, sf_dir):
    from form700_etl_spark.plans.form700 import synthesize_filings

    df = synthesize_filings(spark, sf_dir)
    got = json.loads(df.schema.json())
    want = json.load(open(GOLDEN))

    def canon(x):
        return json.dumps(x, indent=1, sort_keys=True)

    assert canon(got) == canon(want), (
        "synthesize_filings schema drifted from the pinned golden — "
        "field-by-field diff:\n"
        + "\n".join(
            f"  got={g.get('name')}:{g.get('type') if isinstance(g.get('type'), str) else '<nested>'}"
            f" want={w.get('name')}:{w.get('type') if isinstance(w.get('type'), str) else '<nested>'}"
            for g, w in zip(got.get("fields", []), want.get("fields", []))
            if g != w
        )
    )


def test_single_dataset_pruned_schema_is_subset(spark, sf_dir):
    """A pruned construction (datasets=('scheduleA2',)) must carry
    exactly the filer/join columns plus its one schedule array, each
    typed identically to the full tree."""
    from form700_etl_spark.plans.form700 import synthesize_filings

    full = {f.name: f for f in synthesize_filings(spark, sf_dir).schema.fields}
    pruned = synthesize_filings(spark, sf_dir, datasets=("scheduleA2",)).schema
    assert [f.name for f in pruned.fields] == [
        "filingId",
        "filerId",
        "filerName",
        "departmentName",
        "positionName",
        "periodStart",
        "periodEnd",
        "filingDate",
        "offices",
        "scheduleA2",
    ]
    for f in pruned.fields:
        assert f.dataType == full[f.name].dataType, f.name
