"""Local mirror of the driver's correctness gate.

Runs each ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column names,
and an order-insensitive value multiset. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def normalize(rows, columns):
    out = []
    for row in rows:
        vals = []
        for c in sorted(columns):
            v = row[c]
            if isinstance(v, float):
                v = None if v != v else repr(float(v))  # NaN → NULL marker
            elif v is not None and type(v).__module__ == "numpy":
                v = v.item()
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    import duckdb

    import __spark_entry__ as e
    from etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check", cpus=8)
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        spark_rows = [r.asDict() for r in sdf.collect()]
        cols = sdf.columns
        if name not in oracles:
            print(f"{name:24s} rows={len(spark_rows)} (no oracle — rows-only)")
            continue
        odf = con.sql(oracles[name]).df()
        ocols = list(odf.columns)
        orows = odf.to_dict("records")
        problems = []
        if sorted(cols) != sorted(ocols):
            problems.append(f"columns {sorted(cols)} != {sorted(ocols)}")
        if len(spark_rows) != len(orows):
            problems.append(f"rowcount {len(spark_rows)} != {len(orows)}")
        if not problems:
            a, b = normalize(spark_rows, cols), normalize(orows, ocols)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diff}")
        status = "OK" if not problems else "FAIL " + "; ".join(problems)
        print(f"{name:24s} rows={len(spark_rows)} {status}")
        if problems:
            failures.append(name)
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
