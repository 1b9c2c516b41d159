"""As-of join operator tests (ops/asof.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from etl_processes_spark.ops.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01T00:00:05")),
            (2, "u", _ts("2024-01-01T00:00:10")),
            (3, "u", _ts("2024-01-01T00:00:02")),
            (4, "v", _ts("2024-01-01T00:00:07")),
            (5, "w", _ts("2024-01-01T00:00:07")),  # key with no right rows
        ],
        ["event_id", "user", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01T00:00:03"), 1.0),
            ("u", _ts("2024-01-01T00:00:10"), 2.0),  # equal-ts: inclusive
            ("v", _ts("2024-01-01T00:00:09"), 3.0),  # only after left's ts
        ],
        ["user", "ts", "px"],
    )
    return left, right


def test_asof_backward_semantics(spark):
    left, right = _frames(spark)
    got = {
        r["event_id"]: r["px_r"]
        for r in asof_join(left, right, on="user").collect()
    }
    assert got == {1: 1.0, 2: 2.0, 3: None, 4: None, 5: None}


def test_asof_forward_and_tolerance(spark):
    left, right = _frames(spark)
    fwd = {
        r["event_id"]: r["px_r"]
        for r in asof_join(left, right, on="user", direction="forward").collect()
    }
    assert fwd == {1: 2.0, 2: 2.0, 3: 1.0, 4: 3.0, 5: None}

    tol = {
        r["event_id"]: r["px_r"]
        for r in asof_join(left, right, on="user", tolerance_us=2_000_000).collect()
    }
    # event 1 is 2s after the 00:03 purchase (kept); nothing else within 2s
    assert tol == {1: 1.0, 2: 2.0, 3: None, 4: None, 5: None}


def test_asof_single_shuffle_plan(spark):
    left, right = _frames(spark)
    plan = asof_join(left, right, on="user")._jdf.queryExecution().executedPlan().toString()
    # one window pass over a union — no join operator anywhere in the plan
    assert "Window" in plan
    assert "Join" not in plan
