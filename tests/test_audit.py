"""Key-integrity and schema-drift audits."""

from pyspark.sql import functions as F

from etl_processes_spark.ops.audit import (
    accepted_values_violations,
    fk_violations,
    pk_violations,
    schema_drift,
)


def test_pk_violations(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "c"), (None, "d"), (3, "e"), (3, "f"), (3, "g")],
        "id long, v string",
    )
    got = {(r["id"], r["violation"]): r["n_rows"] for r in pk_violations(df, ["id"]).collect()}
    assert got == {(2, "duplicate"): 2, (3, "duplicate"): 3, (None, "null_key"): 1}
    clean = spark.createDataFrame([(1,), (2,)], "id long")
    assert pk_violations(clean, ["id"]).count() == 0


def test_pk_violations_composite(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 1), (2, None)], "a long, b long"
    )
    got = {(r["a"], r["b"], r["violation"]) for r in pk_violations(df, ["a", "b"]).collect()}
    assert got == {(1, 1, "duplicate"), (2, None, "null_key")}


def test_fk_violations(spark):
    parent = spark.createDataFrame([(1,), (2,)], "pid long")
    child = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 9), (13, 9), (14, None)], "id long, ref long"
    )
    got = {r["ref"]: r["n_rows"] for r in fk_violations(child, parent, {"ref": "pid"}).collect()}
    assert got == {9: 2}  # NULL refs opt out, matched refs pass


def test_fk_violations_on_testdata(spark, sf_dir):
    # real referential pair: every lineitem.l_orderkey must exist in orders
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert fk_violations(li, orders, {"l_orderkey": "o_orderkey"}).count() == 0


def test_accepted_values(spark):
    df = spark.createDataFrame(
        [("ok",), ("ok",), ("bad",), (None,)], "status string"
    )
    got = {r["value"]: r["n_rows"] for r in accepted_values_violations(df, "status", ["ok"]).collect()}
    assert got == {"bad": 1, None: 1}
    with_null_ok = accepted_values_violations(df, "status", ["ok", None]).collect()
    assert {r["value"] for r in with_null_ok} == {"bad"}


def test_schema_drift(spark):
    old = spark.createDataFrame([(1, "x", 1.0)], "id long, name string, score double")
    new = spark.createDataFrame([(1, 2, "y")], "id long, score long, extra string")
    drift = {d["column"]: d["status"] for d in schema_drift(old, new)}
    assert drift == {
        "name": "removed",
        "score": "type_changed",
        "extra": "added",
    }
    assert schema_drift(old, old) == []
