"""JIT decomposition probe for ref_pipeline_scheduleA2 (VERDICT r15 task 1).

Measures, per execution in ONE fresh JVM: wall, executor run/CPU deltas,
and the JVM's accumulated JIT compilation time (CompilationMXBean — time
spent on compiler threads, NOT task threads) so the first-exec excess can
be split into (a) C2 compile churn and (b) interpreted/C1 execution on the
task threads.  Optional env knobs for A/B:

  A2_PROBE_WHOLESTAGE=false   -> spark.sql.codegen.wholeStage=false
  A2_PROBE_FACTORYMODE=NO_CODEGEN -> spark.sql.codegen.factoryMode
  A2_PROBE_SPLIT=<n>          -> spark.sql.codegen.methodSplitThreshold
  A2_PROBE_EXECS=<n>          -> executions (default 5)
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
spark = get_spark("jit-probe-scheduleA2")
for env, conf in (
    ("A2_PROBE_WHOLESTAGE", "spark.sql.codegen.wholeStage"),
    ("A2_PROBE_FACTORYMODE", "spark.sql.codegen.factoryMode"),
    ("A2_PROBE_SPLIT", "spark.sql.codegen.methodSplitThreshold"),
):
    v = os.environ.get(env)
    if v:
        spark.conf.set(conf, v)

jvm = spark.sparkContext._jvm
comp = jvm.java.lang.management.ManagementFactory.getCompilationMXBean()

fn = all_queries()["ref_pipeline_scheduleA2"].fn
out = {"sf_dir": sf_dir, "conf": {k: os.environ.get(k) for k in
       ("A2_PROBE_WHOLESTAGE", "A2_PROBE_FACTORYMODE", "A2_PROBE_SPLIT")},
       "runs": []}

t0 = time.perf_counter()
df = fn(spark, sf_dir)
out["plan_build_s"] = round(time.perf_counter() - t0, 3)

for i in range(int(os.environ.get("A2_PROBE_EXECS", "5"))):
    before = bench._stage_totals(spark)
    c0 = comp.getTotalCompilationTime()
    t0 = time.perf_counter()
    df.count()
    wall = round(time.perf_counter() - t0, 3)
    c1 = comp.getTotalCompilationTime()
    after = bench._stage_totals(spark)
    out["runs"].append({
        "i": i,
        "wall_s": wall,
        "jit_compile_s": round((c1 - c0) / 1000.0, 2),
        "executor_run_s": round(after["executor_run_s"] - before["executor_run_s"], 1),
        "executor_cpu_s": round(after["executor_cpu_s"] - before["executor_cpu_s"], 1),
    })

print(json.dumps(out, indent=1))
spark.stop()
