"""Profile one declared query: timed reps + per-stage metrics + plan.

Usage:
    python tools/profile_query.py <query> [sf_dir] [reps]

Runs the query with the Spark UI enabled, materializes via the noop sink,
and prints (a) per-rep wall seconds, (b) the slowest stages from the UI
REST API with their shuffle/in-out bytes, (c) optionally writes
``.explain('formatted')`` next to stdout. Measurement-only tooling — never
imported by the engine.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import __spark_entry__ as entrymod  # noqa: E402
from etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = get_spark("profile", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": "4049"})
    q = entrymod.queries()[name]

    # warm: JVM/codegen outside the timed region (bench.py protocol)
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()

    samples = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{name} rep{i}")
        t0 = time.perf_counter()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"query": name, "reps": samples, "min": min(samples)}))

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"
    try:
        stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    except Exception as exc:  # pragma: no cover - diagnostics only
        print(f"UI REST unavailable: {exc}")
        return
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(f"{'stage':>6} {'runTimeMs':>10} {'cpuMs':>10} {'tasks':>6} "
          f"{'inMB':>8} {'shRdMB':>8} {'shWrMB':>8} {'spillMB':>8}  name")
    for s in stages[:25]:
        print(f"{s['stageId']:>6} {s.get('executorRunTime', 0):>10} "
              f"{(s.get('executorCpuTime') or 0) // 1_000_000:>10} "
              f"{s.get('numCompleteTasks', 0):>6} "
              f"{(s.get('inputBytes') or 0) / 1e6:>8.1f} "
              f"{(s.get('shuffleReadBytes') or 0) / 1e6:>8.1f} "
              f"{(s.get('shuffleWriteBytes') or 0) / 1e6:>8.1f} "
              f"{(s.get('memoryBytesSpilled') or 0) / 1e6:>8.1f}  "
              f"{(s.get('name') or '')[:60]}")
    jobs = json.load(urllib.request.urlopen(f"{base}/jobs"))
    print(f"n_jobs={len(jobs)}")


if __name__ == "__main__":
    main()
