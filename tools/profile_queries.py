#!/usr/bin/env python
"""Per-query job/stage profiler (optimization round instrumentation).

Runs selected registered queries exactly like bench.py (noop sink) with
the Spark event log enabled and a per-query job group, then parses the
event log to attribute every job to its query. Output per query:

    wall          bench-identical wall seconds (build + noop write)
    n_jobs        Spark jobs launched by the query
    job_wall      sum of (job end - job start) wall seconds
    driver_gap    wall - job_wall: driver-side time (py4j, local file
                  IO, manifest JSON, planning) where NO job is running
    task_time     sum of task durations across all jobs (core-seconds)
    max_job       the single longest job's wall seconds

Usage:
    python tools/profile_queries.py q_a q_b ...
    python tools/profile_queries.py --top 25        # slowest from BENCH_full.json
    python tools/profile_queries.py --all
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from iceberg_insert_spark.registry import get_queries  # noqa: E402
from iceberg_insert_spark.session import apply_runtime_confs  # noqa: E402

EVDIR = "/tmp/iis_profile_events"


def build_spark() -> SparkSession:
    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("iis-profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file:{EVDIR}")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return apply_runtime_confs(spark)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    queries = get_queries()
    if args and args[0] == "--top":
        n = int(args[1])
        bench = json.load(
            open(os.path.join(os.path.dirname(__file__), "..", "BENCH_full.json"))
        )
        names = [
            k
            for k, _ in sorted(bench["queries"].items(), key=lambda kv: -kv[1])[:n]
        ]
    elif args and args[0] == "--all":
        names = sorted(queries)
    else:
        names = args
    spark = build_spark()
    spark.sparkContext.setLogLevel("FATAL")

    # warmup identical to bench.py
    from pyspark.sql import functions as F

    from iceberg_insert_spark.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    spark.range(32).groupBy((F.col("id") % 4).alias("g")).applyInPandas(
        lambda pdf: pdf, "id long"
    ).count()

    walls: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name in names:
        spark.sparkContext.setJobGroup(name, name)
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls[name] = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001
            errs[name] = f"{type(exc).__name__}: {exc}"[:150]
        finally:
            spark.sparkContext.setJobGroup("", "")
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log (Spark 4 writes a rolling-log DIRECTORY)
    logf = None
    for f in glob.glob(f"{EVDIR}/*"):
        if app_id in f:
            logf = f
    if os.path.isdir(logf):
        parts = sorted(
            os.path.join(logf, f)
            for f in os.listdir(logf)
            if f.startswith("events")
        )
    else:
        parts = [logf]

    def lines():
        for p in parts:
            if p.endswith(".zstd"):
                import io

                import zstandard

                with open(p, "rb") as raw:
                    r = zstandard.ZstdDecompressor().stream_reader(raw)
                    yield from io.TextIOWrapper(r, encoding="utf-8")
            else:
                with open(p) as fh:
                    yield from fh

    jobs: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}
    if True:
        for line in lines():
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                group = props.get("spark.jobGroup.id", "")
                jobs[jid] = {
                    "group": group,
                    "t0": ev["Submission Time"],
                    "t1": None,
                    "task_ms": 0.0,
                    "n_tasks": 0,
                    "callsite": props.get("callSite.short", ""),
                }
                for sid in ev.get("Stage IDs", []):
                    stage_to_job[sid] = jid
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                jid = stage_to_job.get(sid)
                if jid is not None and jid in jobs:
                    ti = ev.get("Task Info") or {}
                    jobs[jid]["task_ms"] += ti.get("Finish Time", 0) - ti.get(
                        "Launch Time", 0
                    )
                    jobs[jid]["n_tasks"] += 1

    per: dict[str, dict] = {}
    for j in jobs.values():
        g = j["group"]
        if g not in walls:
            continue
        p = per.setdefault(
            g, {"n_jobs": 0, "job_wall": 0.0, "task_time": 0.0, "max_job": 0.0,
                "n_tasks": 0}
        )
        p["n_jobs"] += 1
        if j["t1"] is not None:
            w = (j["t1"] - j["t0"]) / 1000.0
            p["job_wall"] += w
            p["max_job"] = max(p["max_job"], w)
        p["task_time"] += j["task_ms"] / 1000.0
        p["n_tasks"] += j["n_tasks"]

    if os.environ.get("IIS_PROFILE_JOBS"):
        # per-job dump: submission-relative time, duration, callsite
        by_group: dict[str, list] = {}
        for jid in sorted(jobs):
            j = jobs[jid]
            by_group.setdefault(j["group"], []).append(j)
        for g, js in by_group.items():
            if g not in walls:
                continue
            print(f"== {g} (wall {walls[g]:.2f}s, {len(js)} jobs)")
            t_base = js[0]["t0"]
            prev_end = js[0]["t0"]
            for j in js:
                dur = ((j["t1"] or j["t0"]) - j["t0"]) / 1000.0
                gap_before = (j["t0"] - prev_end) / 1000.0
                prev_end = j["t1"] or j["t0"]
                print(
                    f"  +{(j['t0'] - t_base) / 1000.0:7.2f}s "
                    f"gap {gap_before:5.2f} dur {dur:5.2f} "
                    f"tasks {j['n_tasks']:3d} {j['callsite'][:70]}"
                )
    print(
        f"{'query':38s} {'wall':>7s} {'njob':>5s} {'jwall':>7s} "
        f"{'gap':>7s} {'tasks':>6s} {'task_s':>8s} {'maxjob':>7s}"
    )
    rows = []
    for name in names:
        if name in errs:
            print(f"{name:38s} ERR {errs[name]}")
            continue
        w = walls[name]
        p = per.get(name, {"n_jobs": 0, "job_wall": 0.0, "task_time": 0.0,
                           "max_job": 0.0, "n_tasks": 0})
        gap = w - p["job_wall"]
        rows.append((name, w, p, gap))
    for name, w, p, gap in sorted(rows, key=lambda r: -r[1]):
        print(
            f"{name:38s} {w:7.2f} {p['n_jobs']:5d} {p['job_wall']:7.2f} "
            f"{gap:7.2f} {p['n_tasks']:6d} {p['task_time']:8.1f} "
            f"{p['max_job']:7.2f}"
        )
    tot = sum(r[1] for r in rows)
    print(
        f"{'TOTAL':38s} {tot:7.2f} {sum(r[2]['n_jobs'] for r in rows):5d} "
        f"{sum(r[2]['job_wall'] for r in rows):7.2f} "
        f"{sum(r[3] for r in rows):7.2f}"
    )


if __name__ == "__main__":
    main()
