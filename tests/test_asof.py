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


# hypothesis: asof_join vs pandas.merge_asof ---------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    st.lists(  # left: (key, ts_seconds)
        st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=20
    ),
    st.lists(  # right: (key, ts_seconds, value)
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(-5, 5)),
        min_size=0,
        max_size=20,
        unique_by=lambda t: (t[0], t[1]),  # merge_asof tie rules need unique ts
    ),
)
def test_asof_matches_pandas_merge_asof(spark, lefts, rights):
    import pandas as pd

    lpdf = pd.DataFrame(
        {
            "eid": range(len(lefts)),
            "k": [t[0] for t in lefts],
            "ts": pd.to_datetime([t[1] for t in lefts], unit="s"),
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": pd.array([t[0] for t in rights], dtype="int64"),
            "ts": pd.to_datetime([t[1] for t in rights], unit="s"),
            "val": pd.array([float(t[2]) for t in rights], dtype="float64"),
        }
    )
    left = spark.createDataFrame(lpdf)
    right = (
        spark.createDataFrame(rpdf)
        if len(rpdf)
        else spark.createDataFrame([], "k long, ts timestamp, val double")
    )
    got = (
        asof_join(left, right, on="k")
        .select("eid", "val_r")
        .toPandas()
        .set_index("eid")["val_r"]
        .to_dict()
    )
    exp_df = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable"),
        rpdf.sort_values("ts", kind="stable"),
        on="ts",
        by="k",
        direction="backward",
    )
    exp = exp_df.set_index("eid")["val"].to_dict()
    for eid in exp:
        g, e = got[eid], exp[eid]
        g_null = g is None or g != g  # toPandas renders SQL NULL as NaN
        assert (g_null and e != e) or g == e


def test_asof_null_value_col_not_backfilled(spark):
    # Matched right row has a NULL in one value column: that NULL must
    # survive — never be backfilled from an OLDER right row (chimera bug).
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T00:00:10"))], ["event_id", "user", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01T00:00:01"), 1.0, 2.0),
            ("u", _ts("2024-01-01T00:00:05"), 3.0, None),
        ],
        "user string, ts timestamp, a double, b double",
    )
    row = asof_join(left, right, on="user").collect()[0]
    assert row["a_r"] == 3.0
    assert row["b_r"] is None  # from the SAME matched row, not ts=1's 2.0
    assert row["ts_r"] == 1704067205000000


def test_asof_right_ts_ties_are_deterministic(spark):
    from datetime import datetime

    t = datetime.fromisoformat("2024-01-01T00:00:05")
    left = spark.createDataFrame([(1, "u", datetime.fromisoformat("2024-01-01T00:00:09"))],
                                 ["event_id", "user", "ts"])
    right = spark.createDataFrame(
        [("u", t, 1.0), ("u", t, 2.0)], ["user", "ts", "px"]
    )
    # tied right timestamps: ties break on the value columns (sort-last wins
    # backward), identically under any partitioning
    for parts in (1, 5):
        got = asof_join(left, right.repartition(parts), on="user").collect()
        assert got[0]["px_r"] == 2.0
