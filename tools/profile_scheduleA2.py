"""One-off profiler for ref_pipeline_scheduleA2 (VERDICT r12 task 1).

Times plan CONSTRUCTION (pipeline_dataset -> lazy DataFrame, pure
Catalyst/py4j driver work) separately from EXECUTION (.count()), with
per-execution stage-metric deltas, in one fresh JVM at the given SF dir.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from form700_etl_spark.registry import all_queries  # noqa: E402
from form700_etl_spark.session import get_spark  # noqa: E402
import bench  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile-scheduleA2")
fn = all_queries()["ref_pipeline_scheduleA2"].fn

out = {"sf_dir": sf_dir, "runs": []}

t0 = time.perf_counter()
df = fn(spark, sf_dir)
out["plan_build_s"] = round(time.perf_counter() - t0, 3)

for i in range(4):
    before = bench._stage_totals(spark)
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)  # memoized -> ~0s after first
    build = time.perf_counter() - t0
    t0 = time.perf_counter()
    df.count()
    exec_s = time.perf_counter() - t0
    after = bench._stage_totals(spark)
    delta = {k: round(after[k] - before[k], 2) for k in after}
    out["runs"].append(
        {"i": i, "rebuild_s": round(build, 3), "exec_s": round(exec_s, 3),
         "metrics": delta}
    )

print(json.dumps(out, indent=1))
spark.stop()
