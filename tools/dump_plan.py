"""Write ``.explain('formatted')`` for declared queries to plans/<out>.

Usage: python tools/dump_plan.py <outdir> <query> [query ...]
Writes plans/<outdir>/<query>_<suffix>.txt with suffix from
$PLAN_SUFFIX (default 'after'). Measurement-only tooling.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import __spark_entry__ as entrymod  # noqa: E402
from etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = os.environ.get("PLAN_SUFFIX", "after")
    spark = get_spark("dump-plan", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    qs = entrymod.queries()
    os.makedirs(os.path.join("plans", outdir), exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join("plans", outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
