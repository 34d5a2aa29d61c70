"""Per-JOB wall-clock timeline for one declared query: one warm rep, one
timed rep, then every job of the timed rep with its wall duration, stage
ids, and the dominant stage's task/shuffle stats. Measurement-only.

Usage: python tools/profile_jobs.py <query> [sf_dir]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import __spark_entry__ as entrymod  # noqa: E402
from etl_spark.session import get_spark  # noqa: E402


def ts(s: str) -> float:
    return dt.datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("profile", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": "4049"})
    q = entrymod.queries()[name]
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"
    jobs0 = {j["jobId"] for j in json.load(urllib.request.urlopen(f"{base}/jobs"))}

    t0 = time.perf_counter()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    jobs = [j for j in json.load(urllib.request.urlopen(f"{base}/jobs"))
            if j["jobId"] not in jobs0 and j.get("completionTime")]
    jobs.sort(key=lambda j: j["jobId"])
    stages = {s["stageId"]: s for s in
              json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))}
    print(f"query={name} timed_rep_wall={wall:.3f}s n_jobs={len(jobs)}")
    prev_end = None
    print(f"{'job':>4} {'gap':>6} {'dur':>7} {'tasks':>6}  stages(tasks,inMB,shRd,shWr)")
    for j in jobs:
        sub, comp = ts(j["submissionTime"]), ts(j["completionTime"])
        gap = (sub - prev_end) if prev_end is not None else 0.0
        prev_end = comp
        parts = []
        for sid in sorted(j.get("stageIds", [])):
            s = stages.get(sid)
            if not s:
                continue
            parts.append(
                f"s{sid}({s.get('numCompleteTasks',0)}t,"
                f"{(s.get('inputBytes') or 0)/1e6:.0f}i,"
                f"{(s.get('shuffleReadBytes') or 0)/1e6:.0f}r,"
                f"{(s.get('shuffleWriteBytes') or 0)/1e6:.0f}w,"
                f"{(s.get('executorRunTime') or 0)/1e3:.1f}s)")
        print(f"{j['jobId']:>4} {gap:6.2f} {comp-sub:7.2f} "
              f"{j.get('numCompletedTasks',0):>6}  {' '.join(parts)[:110]}")
        desc = (j.get("description") or j.get("name") or "").replace("\n", " ")
        if desc:
            print(f"      {desc[:120]}")


if __name__ == "__main__":
    main()
