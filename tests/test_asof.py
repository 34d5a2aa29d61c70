from etl_spark.operators.asof import asof_join, asof_join_broadcast, asof_lookup_literal


def mk(spark):
    left = spark.createDataFrame(
        [("t", 5, "e1"), ("t", 25, "e2"), ("t", 10, "e3"), ("u", 7, "e4")],
        "tbl string, lsn long, name string",
    )
    right = spark.createDataFrame(
        [("t", 0, "v0"), ("t", 10, "v1"), ("t", 20, "v2"), ("u", 100, "vX")],
        "tbl string, snap long, version string",
    )
    return left, right


EXPECT = {"e1": "v0", "e2": "v2", "e3": "v1", "e4": None}


def test_asof_join_union_trick(spark):
    left, right = mk(spark)
    out = asof_join(left, right, on=["tbl"], left_ts="lsn", right_ts="snap")
    got = {r.name: r.version for r in out.collect()}
    assert got == EXPECT  # largest snap <= lsn (store/schema/base.rs:20-34)


def test_asof_join_broadcast(spark):
    left, right = mk(spark)
    out = asof_join_broadcast(left, right, on=["tbl"], left_ts="lsn", right_ts="snap")
    got = {r.name: r.version for r in out.collect()}
    assert got == EXPECT


def test_asof_forward(spark):
    left, right = mk(spark)
    out = asof_join(left, right, on=["tbl"], left_ts="lsn", right_ts="snap",
                    direction="forward")
    got = {r.name: r.version for r in out.collect()}
    assert got == {"e1": "v1", "e2": None, "e3": "v1", "e4": "vX"}


def test_asof_literal_case_chain(spark):
    left, _ = mk(spark)
    out = asof_lookup_literal(
        left.filter("tbl = 't'"), [(0, "v0"), (10, "v1"), (20, "v2")], left_ts="lsn"
    )
    got = {r.name: (r.snapshot_lsn, r.schema_version) for r in out.collect()}
    assert got == {"e1": (0, "v0"), "e2": (20, "v2"), "e3": (10, "v1")}
