"""Two-decade scale spot-check (round-8 verdict item #2): run the
heaviest queries ISOLATED (one fresh JVM each) at 10x and 100x of sf0.1
(= sf1- and sf10-equivalent data) and record t100/t10 per query.

The standing 10x sweep (tools/stress.py) proves one decade; this proves
the SECOND decade on the queries where a hidden super-linearity would
hurt most — graph, pair-emitters, label propagation, wide aggregates,
the bucket-sink stream family, and the warehouse destination. Isolated
runs are the only actionable basis (twice-confirmed rule: in-suite
factors measure neighbor pressure, not the query).

    python tools/stress100.py                 # full spot-check
    python tools/stress100.py --run Q SF_DIR  # child mode (internal)

Linear expectation on fixed cores: t100/t10 ~= 10. Factors well above
that get a SCALE.md note; a timeout is recorded, not fatal.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

#: the round-8 verdict's named heavy hitters
QUERIES = [
    "parts_triangle_count",
    "parts_triangle_sample",
    "docs_exact_jaccard_join",
    "dedup_simhash_clusters",
    "dedup_minhash_incremental",
    "docs_winnowing",
    "lineitem_metric_correlations",
    "embeddings_covariance",
    # bucket-sink stream family (manifest sinks under DDL/rebucket/replay)
    "cdc_rebucket_migration",
    "cdc_ddl_rebucket_compact",
    "cdc_scd2_schema_evolution",
    # warehouse destination
    "cdc_duckdb_current_state",
]

TIMEOUT_SEC = 1800


def child(query: str, sf_dir: str) -> None:
    from etl_spark.session import get_spark

    spark = get_spark("stress100", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    import __spark_entry__ as e

    fn = e.queries()[query]
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(json.dumps({"sec": round(time.perf_counter() - t0, 2)}))


def run_isolated(query: str, sf_dir: str) -> float | str:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="64g")
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", query, sf_dir],
            capture_output=True, text=True, timeout=TIMEOUT_SEC, env=env,
            cwd=os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."),
        )
    except subprocess.TimeoutExpired:
        return "timeout"
    for line in reversed(out.stdout.splitlines()):
        if line.startswith("{"):
            return json.loads(line)["sec"]
    return f"error: {out.stderr[-300:]}"


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        child(sys.argv[2], sys.argv[3])
        return
    out_path = sys.argv[1] if len(sys.argv) > 1 else "STRESS100_r9.json"
    from etl_spark.session import get_spark
    from tools.stress import build

    datasets = {}
    spark = None
    for k in (10, 100):
        dest = f"/tmp/stress_x{k}"
        if not (os.environ.get("STRESS_REUSE") and os.path.exists(dest)):
            if spark is None:
                spark = get_spark("stress100-build", cpus=32)
            t0 = time.perf_counter()
            build(spark, k, dest)
            print(f"built x{k} in {time.perf_counter()-t0:.0f}s", flush=True)
        datasets[k] = dest
    if spark is not None:
        spark.stop()  # children get their own fresh JVMs

    only = os.environ.get("STRESS100_ONLY")
    names = [n for n in only.split(",") if n] if only else QUERIES
    result: dict[str, dict] = {}
    for q in names:
        row = {}
        for k in (10, 100):
            sec = run_isolated(q, datasets[k])
            row[f"t{k}"] = sec
            print(f"{q} x{k}: {sec}", flush=True)
        if isinstance(row.get("t10"), float) and isinstance(row.get("t100"), float):
            row["factor"] = round(row["t100"] / max(row["t10"], 0.05), 1)
        result[q] = row
        with open(out_path, "w") as f:
            json.dump({"k_pair": [10, 100], "timeout_sec": TIMEOUT_SEC,
                       "queries": result}, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
