"""Type-inference cascade tests, including the reference-CSV ground-truth
parity (labels obtained by executing the reference's detect_column_type on
its own fixture — including its famous date/address→phone quirk)."""

import pytest

from etl_processes_spark.profile import infer_types

# Ground truth from executing /root/reference/Latanova_v1.py's
# detect_column_type on customer_data_test.csv (see SKILL.md / SURVEY §2.11):
REFERENCE_EXPECTED = {
    "customer_id": "integer",
    "name": "text",
    "email": "email",
    "phone": "phone",
    "address": "phone",
    "join_date": "phone",       # date strings strip to 8 digits → phone (Q1)
    "last_purchase": "phone",
    "total_spent": "float",
    "purchase_count": "integer",
    "is_vip": "boolean",
    "segment": "categorical",
    "satisfaction_score": "integer",
    "feedback": "text",
}


@pytest.fixture(scope="module")
def ref_csv(spark):
    return (
        spark.read.csv(
            "/root/reference/customer_data_test.csv", header=True, inferSchema=True
        )
        .na.drop("any")
    )


def test_reference_csv_parity(ref_csv):
    got = infer_types(ref_csv)
    assert got == REFERENCE_EXPECTED


def test_boolean_vocab_over_numeric(spark):
    # {0,1} integer column → boolean BEFORE numeric (Latanova_v1.py:133-137)
    df = spark.createDataFrame([(0,), (1,), (1,), (0,)], ["b"])
    assert infer_types(df)["b"] == "boolean"


def test_email_before_numeric(spark):
    df = spark.createDataFrame([("a@b.com",)] * 10, ["e"])
    assert infer_types(df)["e"] == "email"


def test_numeric_strings(spark):
    df = spark.createDataFrame([(str(v),) for v in [1.5, 2.5, 3.25, 9.75] * 5], ["x"])
    assert infer_types(df)["x"] == "float"
    df2 = spark.createDataFrame([(str(v),) for v in [10, 20, 30, 42] * 5], ["x"])
    # 2-digit integers: only 2 distinct... use 4 distinct, all < 7 digits
    assert infer_types(df2)["x"] == "integer"


def test_datetime_strings(spark):
    df = spark.createDataFrame(
        [("2020-01-15 10:30:00",), ("2021-03-04 00:00:00",)] * 10, ["d"]
    )
    # 14 digits after stripping → phone wins first (reference order, Q1)
    assert infer_types(df)["d"] == "phone"
    # sub-7-digit datetime-like strings do reach the datetime branch:
    df2 = spark.createDataFrame([("1/2/20",), ("3/4/21",)] * 10, ["d"])
    got = infer_types(df2)["d"]
    assert got in ("datetime", "categorical")  # digits=6 <7 → not phone


def test_categorical_vs_text(spark):
    cats = spark.createDataFrame([(v,) for v in ["aa", "bb", "cc"] * 40], ["c"])
    assert infer_types(cats)["c"] == "categorical"
    texts = spark.createDataFrame(
        [(f"unique text entry number {i} with words",) for i in range(100)], ["c"]
    )
    assert infer_types(texts)["c"] == "text"


def test_probe_rows_decision_equivalence_on_reference_csv(spark):
    """The bounded-probe knob (reference head(100) parity,
    Latanova_v1.py:72,79,104,163) must reach the same type decisions as the
    full-column ratios on the reference fixture."""
    df = (
        spark.read.csv(
            "/root/reference/customer_data_test.csv", header=True, inferSchema=True
        )
        .na.drop("any")
    )
    full = infer_types(df)
    probed = infer_types(df, probe_rows=100)
    assert probed == full
    # the known-good reference decisions hold under the probe
    assert probed["email"] == "email"
    assert probed["join_date"] == "phone"  # faithful reference quirk
