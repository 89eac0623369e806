"""Per-stage wall/task-time decomposition for one registry entry, from the
Spark event log (the local stand-in for the UI's Stages tab — guide §1/§7).

Runs the entry once untimed (warm), then once with a fresh job-group and
prints every stage of the timed run: wall ms (submission→completion), task
time sum, task count, shuffle read/write bytes, input bytes, and the
first line of the stage name/callsite. Jobs are listed with their wall
times so sequential barriers (persist().count(), localCheckpoint rounds,
driver collects) show up as gaps.

Usage: python tools/stage_times.py [sf_dir] entry_name
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    name = args[0]

    import __spark_entry__ as entry

    log_dir = tempfile.mkdtemp(prefix="spark_events_")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from nsdb_spark.session import tuned_builder

    # measurement parity with bench.py: shared tuned defaults
    # (nsdb_spark/session.py — code cache + 8 KB codegen fallback)
    spark = (
        tuned_builder(f"local[{cpus}]", "stage-times")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", log_dir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    fn = qs[name]

    # warm exactly like bench.py
    fn(spark, sf_dir).collect()
    spark.catalog.clearCache()

    t0 = time.time()
    df = fn(spark, sf_dir)
    t_build = time.time() - t0
    t1 = time.time()
    df.collect()
    t_exec = time.time() - t1
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # ---- parse the event log ----
    import glob

    cands = glob.glob(os.path.join(log_dir, "*" + app_id + "*"))
    path = cands[0] if cands else os.path.join(log_dir, app_id)
    if os.path.isdir(path):  # rolling event log v2: a dir of event files
        files = sorted(
            p for p in glob.glob(os.path.join(path, "events_*"))
        )
    else:
        files = [path]
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}

    def _lines():
        for p in files:
            with open(p) as f:
                yield from f

    if True:
        for line in _lines():
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                st = stages.setdefault(si["Stage ID"], {})
                st["wall"] = si.get("Completion Time", 0) - si.get(
                    "Submission Time", 0
                )
                st["tasks"] = si["Number of Tasks"]
                st["name"] = si["Stage Name"].splitlines()[0][:90]
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {})
                m = ev.get("Task Metrics") or {}
                st["task_ms"] = st.get("task_ms", 0) + m.get(
                    "Executor Run Time", 0
                )
                st["gc_ms"] = st.get("gc_ms", 0) + m.get("JVM GC Time", 0)
                st["deser_ms"] = st.get("deser_ms", 0) + m.get(
                    "Executor Deserialize Time", 0
                )
                sr = m.get("Shuffle Read Metrics") or {}
                st["sh_read"] = (
                    st.get("sh_read", 0)
                    + sr.get("Local Bytes Read", 0)
                    + sr.get("Remote Bytes Read", 0)
                )
                st["fetch_ms"] = st.get("fetch_ms", 0) + sr.get(
                    "Fetch Wait Time", 0
                )
                sw = m.get("Shuffle Write Metrics") or {}
                st["sh_write"] = st.get("sh_write", 0) + sw.get(
                    "Shuffle Bytes Written", 0
                )
                im = m.get("Input Metrics") or {}
                st["input"] = st.get("input", 0) + im.get("Bytes Read", 0)

    print(f"\n== {name}: build {t_build:.3f}s exec {t_exec:.3f}s "
          f"(timed run only below) ==")
    # jobs of the timed run = jobs submitted after construction began
    # (eager operators run their pipeline during build)
    timed_jobs = {
        jid: j for jid, j in jobs.items() if j["t0"] >= int(t0 * 1000) - 50
    }
    prev_end = None
    for jid in sorted(timed_jobs):
        j = timed_jobs[jid]
        wall = (j.get("t1", j["t0"]) - j["t0"]) / 1000
        gap = "" if prev_end is None else f" (+{(j['t0'] - prev_end) / 1000:.3f}s gap)"
        prev_end = j.get("t1", j["t0"])
        print(f"job {jid:4d} {wall:7.3f}s{gap}  {j['desc'][:60]}")
        for sid in sorted(j["stages"]):
            st = stages.get(sid)
            if not st or "wall" not in st:
                continue  # skipped stage (reused exchange)
            print(
                f"   stage {sid:4d} wall {st['wall']/1000:7.3f}s "
                f"task_sum {st.get('task_ms',0)/1000:8.3f}s "
                f"gc {st.get('gc_ms',0)/1000:6.3f}s "
                f"deser {st.get('deser_ms',0)/1000:6.3f}s "
                f"fetchw {st.get('fetch_ms',0)/1000:6.3f}s "
                f"n={st.get('tasks',0):3d} "
                f"in={st.get('input',0)//1024}K "
                f"sr={st.get('sh_read',0)//1024}K "
                f"sw={st.get('sh_write',0)//1024}K  {st.get('name','')}"
            )
    print(f"\nevent log: {path}")


if __name__ == "__main__":
    main()
