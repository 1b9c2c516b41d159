"""Text-analysis operator tests, cross-checked against DuckDB (the same SQL
twins used by the oracle gate) on a small corpus."""

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_processes_spark.ops.textstats import (
    fingerprint,
    lang_id,
    quality_features,
    token_count,
    winnowing_fingerprints,
)

DOCS = [
    (0, "The quick brown fox is in the yard."),
    (1, "der hund und die katze das ist gut"),
    (2, "el gato es una mascota que vive en la casa"),
    (3, "le chat est dans les jardins qui sont grands"),
    (4, "xyzzy qwerty plugh"),                    # no markers → und
    (5, ""),                                      # empty
    (6, "a b c 123 !!! mixed-content: 42% done"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_token_count(docs):
    rows = {r["doc_id"]: r for r in token_count(docs, "doc_id", "text").collect()}
    assert rows[0]["n_tokens"] == 8
    assert rows[5]["n_tokens"] == 0
    assert rows[6]["n_tokens"] == 8  # a b c 123 mixed content 42 done
    assert rows[0]["n_chars_measured"] == len(DOCS[0][1])


def test_lang_id_markers(docs):
    rows = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs, "doc_id", "text").collect()}
    assert rows[0] == "en"
    assert rows[1] == "de"
    assert rows[2] == "es"
    assert rows[3] == "fr"
    assert rows[4] == "und"
    assert rows[5] == "und"


def test_quality_features_bounds(docs):
    rows = {r["doc_id"]: r for r in quality_features(docs, "doc_id", "text").collect()}
    for r in rows.values():
        assert 0.0 <= r["quality_score"] <= 1.0
        assert 0.0 <= r["alpha_ratio"] <= 1.0
    assert rows[5]["quality_score"] == 0.0
    assert rows[0]["stopword_ratio"] > rows[4]["stopword_ratio"]


def test_fingerprint_is_normalization_invariant(spark):
    df = spark.createDataFrame(
        [(0, "Hello,   World!"), (1, "hello world"), (2, "different")],
        ["doc_id", "text"],
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df, "doc_id", "text").collect()}
    assert fps[0] == fps[1] != fps[2]


def test_fingerprint_matches_duckdb_md5(docs):
    spark_fp = {
        r["doc_id"]: r["fingerprint"] for r in fingerprint(docs, "doc_id", "text").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    duck = dict(
        con.execute(
            "SELECT doc_id, md5(coalesce(array_to_string("
            "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''), ' '), '')) FROM d"
        ).fetchall()
    )
    assert spark_fp == duck


def test_winnowing_shape(docs):
    rows = {r["doc_id"]: r["fingerprints"] for r in
            winnowing_fingerprints(docs, "doc_id", "text", k=3, window=4).collect()}
    assert len(rows[0]) >= 1
    # identical docs → identical fingerprint sets
    assert rows[4] is not None
