"""Per-stage JIT decomposition for ref_pipeline_scheduleA2 (r16 task 1).

In ONE fresh JVM: run the query N times (count(), the bench's timed
action), and after each run report the NEW stages (AppStatusStore) with
executorRunTime / executorCpuTime, the JVM's accumulated JIT compilation
time, and Spark's CodegenMetrics deltas (generated classes + bytecode
bytes) — so the first-exec excess is attributed to a specific stage and
a specific code volume.

Env knobs:
  A2_PROBE_EXECS=<n>        executions (default 5)
  A2_PROBE_ACTION=noop      noop sink instead of count()
  A2_PROBE_SPLIT=<n>        spark.sql.codegen.methodSplitThreshold
  A2_PROBE_WHOLESTAGE=false spark.sql.codegen.wholeStage
  A2_PROBE_MAXFIELDS=<n>    spark.sql.codegen.maxFields
  A2_PROBE_HUGE=<n>         spark.sql.codegen.hugeMethodLimit
  A2_PROBE_JAVAOPTS=<opts>  APPENDED to spark.driver.extraJavaOptions
                            (needs a fresh JVM; set before first session)
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import form700_etl_spark.session as session_mod  # noqa: E402

_extra = os.environ.get("A2_PROBE_JAVAOPTS")
if _extra:
    _orig = session_mod.get_spark

    def get_spark(app_name="probe", shuffle_partitions=None):
        from pyspark.sql import SparkSession

        cpus = session_mod.cpu_count()
        sp = shuffle_partitions or max(cpus, 4)
        b = SparkSession.builder
        # replicate get_spark but with appended java opts
        import inspect

        src = None  # keep identical confs by calling the original builder path
        # simplest: call original then stop? No - JVM opts need launch time.
        # So: duplicate the conf list from session.get_spark.
        b = (
            b.master(f"local[{cpus}]")
            .appName(app_name)
            .config("spark.sql.shuffle.partitions", str(sp))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
            .config("spark.sql.legacy.parquet.nanosAsLong", "true")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", session_mod._default_driver_mem())
            .config(
                "spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=1024m " + _extra,
            )
            .config("spark.sql.codegen.cache.maxEntries", "2000")
            .config("spark.sql.codegen.methodSplitThreshold", "256")
            .config("spark.ui.retainedStages", "10000")
        )
        spark = b.getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        return spark

    session_mod.get_spark = get_spark

from form700_etl_spark.registry import all_queries  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = session_mod.get_spark("stage-probe-scheduleA2")
for env, conf in (
    ("A2_PROBE_WHOLESTAGE", "spark.sql.codegen.wholeStage"),
    ("A2_PROBE_SPLIT", "spark.sql.codegen.methodSplitThreshold"),
    ("A2_PROBE_MAXFIELDS", "spark.sql.codegen.maxFields"),
    ("A2_PROBE_HUGE", "spark.sql.codegen.hugeMethodLimit"),
):
    v = os.environ.get(env)
    if v:
        spark.conf.set(conf, v)

jvm = spark.sparkContext._jvm
comp = jvm.java.lang.management.ManagementFactory.getCompilationMXBean()
sc = spark.sparkContext
store = sc._jsc.sc().statusStore()
darr = sc._gateway.new_array(sc._gateway.jvm.double, 0)
empty = sc._jvm.java.util.ArrayList()
cg = jvm.org.apache.spark.metrics.source.CodegenMetrics


def codegen_snapshot() -> dict:
    return {
        "compile_n": cg.METRIC_SOURCE_CODE_SIZE().getCount(),
        "src_bytes": cg.METRIC_SOURCE_CODE_SIZE().getSnapshot().getMax()
        and sum_hist(cg.METRIC_SOURCE_CODE_SIZE()),
        "class_bytes": sum_hist(cg.METRIC_GENERATED_CLASS_BYTECODE_SIZE()),
        "method_max": cg.METRIC_GENERATED_METHOD_BYTECODE_SIZE()
        .getSnapshot()
        .getMax(),
        "janino_ms": cg.METRIC_COMPILATION_TIME().getSnapshot().getMax()
        and sum_hist(cg.METRIC_COMPILATION_TIME()),
    }


def sum_hist(h) -> int:
    snap = h.getSnapshot()
    vals = snap.getValues()
    return int(sum(vals))


def stages() -> dict[int, dict]:
    out = {}
    it = store.stageList(None, False, False, darr, empty).iterator()
    while it.hasNext():
        s = it.next()
        out[int(s.stageId())] = {
            "name": str(s.name())[:40],
            "run_s": round(s.executorRunTime() / 1000.0, 2),
            "cpu_s": round(s.executorCpuTime() / 1e9, 2),
            "gc_s": round(s.jvmGcTime() / 1000.0, 2),
            "tasks": int(s.numCompleteTasks()),
            "shuffle_w_mb": round(s.shuffleWriteBytes() / 1048576.0, 1),
        }
    return out


fn = all_queries()["ref_pipeline_scheduleA2"].fn
t0 = time.perf_counter()
df = fn(spark, sf_dir)
plan_build_s = round(time.perf_counter() - t0, 3)
print(json.dumps({"plan_build_s": plan_build_s, "javaopts": _extra or "",
                  "split": os.environ.get("A2_PROBE_SPLIT", "256")}))

seen: set[int] = set()
prev_cg = codegen_snapshot()
for i in range(int(os.environ.get("A2_PROBE_EXECS", "5"))):
    c0 = comp.getTotalCompilationTime()
    t0 = time.perf_counter()
    if os.environ.get("A2_PROBE_ACTION") == "noop":
        df.write.format("noop").mode("overwrite").save()
    else:
        df.count()
    wall = round(time.perf_counter() - t0, 3)
    c1 = comp.getTotalCompilationTime()
    cur_cg = codegen_snapshot()
    snap = stages()
    new = {
        k: v
        for k, v in snap.items()
        if k not in seen and (v["run_s"] > 0.05 or v["shuffle_w_mb"] > 0)
    }
    seen.update(snap)
    print(json.dumps({
        "exec": i,
        "wall_s": wall,
        "jit_compile_s": round((c1 - c0) / 1000.0, 2),
        "codegen_delta": {
            k: cur_cg[k] - prev_cg[k] for k in cur_cg
        },
        "stages": dict(sorted(new.items())),
    }))
    prev_cg = cur_cg

spark.stop()
