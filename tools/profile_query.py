#!/usr/bin/env python
"""Profile one or more headline queries: run with the event log enabled,
then print a per-job / per-stage breakdown (submit→complete wall time,
summed task time, shuffle bytes) so optimization effort lands where the
time actually goes (guide §1: measure first, §7.1: UI/stage view — this
is the headless stand-in for the Stages tab).

Usage: python tools/profile_query.py name1 [name2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events"


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(EVDIR, exist_ok=True)

    # Build the session through get_spark so every laradb config matches
    # the bench exactly; the event log (via submit args, which must be set
    # before the JVM gateway launches) is the only addition.
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f"--conf spark.eventLog.enabled=true --conf spark.eventLog.dir={EVDIR} "
        "--conf spark.eventLog.compress=false "
        "--conf spark.eventLog.rolling.enabled=false "
        "pyspark-shell"
    )
    from laradb_spark.session import get_spark
    import bench
    import __spark_entry__ as entry_mod

    spark = get_spark("laradb-profile")
    app_id = spark.sparkContext.applicationId
    qs = dict(entry_mod.queries())
    serve_names = {
        "ann_pq_serve", "ann_ivfpq_serve", "ann_ivfpq_res_serve",
        "hybrid_serve", "bm25_prf_serve_steady",
    }
    if any(n in serve_names for n in names):
        qs.update(bench._serve_entries(spark, ["/root/testdata/sf0.001", sf_dir]))

    # warm (codegen + worker spawn), then one timed run per query with a
    # job-group label so the event log attributes jobs to queries.
    for name in names:
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    spans = {}
    for name in names:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"PROFILE:{name}")
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spans[name] = (t0, time.time())
        spark.sparkContext.setJobDescription(None)
    spark.stop()

    # ---- parse the event log ----
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    path = f"{EVDIR}/{app_id}"
    with open(path) as f:
        for line in f:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "t0": ev["Submission Time"] / 1000.0,
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"] / 1000.0
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:90],
                    "tasks": si["Number of Tasks"],
                    "t0": si.get("Submission Time", 0) / 1000.0,
                    "t1": si.get("Completion Time", 0) / 1000.0,
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {})
                m = ev.get("Task Metrics") or {}
                st["task_ms"] = st.get("task_ms", 0) + m.get("Executor Run Time", 0)
                st["py_ms"] = st.get("py_ms", 0) + (
                    m.get("Executor Deserialize Time", 0)
                )
                sr = m.get("Shuffle Read Metrics") or {}
                sw = m.get("Shuffle Write Metrics") or {}
                st["sh_read"] = st.get("sh_read", 0) + sr.get(
                    "Remote Bytes Read", 0
                ) + sr.get("Local Bytes Read", 0)
                st["sh_write"] = st.get("sh_write", 0) + sw.get(
                    "Shuffle Bytes Written", 0
                )

    for name in names:
        t0, t1 = spans[name]
        print(f"\n=== {name}: wall {t1 - t0:.3f}s ===")
        sel = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if j.get("desc") == f"PROFILE:{name}" and "t1" in j
        ]
        for jid, j in sel:
            jw = j["t1"] - j["t0"]
            print(f"  job {jid}: {jw:7.3f}s")
            for sid in sorted(j["stages"]):
                s = stages.get(sid)
                if not s or "t1" not in s or not s.get("t0"):
                    continue
                print(
                    f"    stage {sid:4d} [{s.get('tasks', '?'):>3} tasks] "
                    f"{s['t1'] - s['t0']:7.3f}s task_ms={s.get('task_ms', 0):6d} "
                    f"shR={s.get('sh_read', 0):>8} shW={s.get('sh_write', 0):>8} "
                    f" {s.get('name', '')}"
                )
        gaps = 0.0
        prev = t0
        for jid, j in sel:
            gaps += max(0.0, j["t0"] - prev)
            prev = max(prev, j["t1"])
        gaps += max(0.0, t1 - prev)
        print(f"  driver/gaps (outside jobs): {gaps:.3f}s over {len(sel)} jobs")


if __name__ == "__main__":
    main()
