"""ANSI-mode robustness: Spark 4 enables spark.sql.ansi.enabled by default
and the correctness driver runs the gate queries in ITS OWN session — every
operator must produce identical results with ANSI on (no runtime errors
from strict casts/arithmetic, no silent semantic drift)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def ansi(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_generators_match_under_ansi(ansi, spark):
    from etl_processes_spark.generate.generators import u_expr, z_expr

    def mk():
        return spark.range(500).select(
            F.round(u_expr(7, "a"), 9).alias("u"), F.round(z_expr(7, "b"), 9).alias("z")
        )

    with_ansi = _rows(mk())
    spark.conf.set("spark.sql.ansi.enabled", "false")
    without = _rows(mk())
    spark.conf.set("spark.sql.ansi.enabled", "true")
    assert with_ansi == without


def test_text_ops_run_under_ansi(ansi, spark):
    from etl_processes_spark.ops.dedup import ngram_jaccard_pairs, simhash_fingerprints
    from etl_processes_spark.ops.pack import chunk_documents, mixture_sample
    from etl_processes_spark.ops.textstats import quality_features, unigram_logprob_score

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat sat on the hat"),
         (3, ""), (4, None), (5, "unique words entirely here")],
        ["doc_id", "text"],
    )
    assert ngram_jaccard_pairs(docs, "doc_id", "text", k=2, threshold=0.1).count() >= 1
    assert simhash_fingerprints(docs, "doc_id", "text").count() == 3  # token-bearing docs
    assert quality_features(docs, "doc_id", "text").count() == 5
    assert unigram_logprob_score(docs, "doc_id", "text").count() == 5
    assert chunk_documents(docs, "doc_id", "text", 3, 2).count() >= 5
    assert mixture_sample(docs.withColumn("g", F.lit("x")), "g", {"x": 1.0}, "doc_id").count() == 5


def test_profile_generate_under_ansi(ansi, spark):
    from etl_processes_spark import generate, profile

    df = spark.createDataFrame(
        [(i, float(i) * 1.5, "A" if i % 2 else "B") for i in range(50)],
        ["k", "v", "c"],
    )
    profs = profile(df, sample_rows=None)
    assert generate(spark, profs, 20, seed=3).count() == 20


def test_pack_and_windows_under_ansi(ansi, spark):
    import datetime

    from etl_processes_spark.ops.pack import pack_documents
    from etl_processes_spark.streaming.windows import sessionize

    d = spark.createDataFrame([(i, 10 + i) for i in range(20)], ["doc_id", "n"])
    assert pack_documents(d, "doc_id", "n", budget=64).count() == 20
    ev = spark.createDataFrame(
        [(i, i % 3, datetime.datetime(2026, 1, 1, 0, i), "c", 1.0) for i in range(10)],
        ["event_id", "user_id", "ts", "event_type", "value"],
    )
    assert sessionize(ev, gap_minutes=30).count() == 3


def test_round4_ops_under_ansi(ansi, spark):
    from etl_processes_spark.ops.classify import score_with_classifier
    from etl_processes_spark.ops.dedup import line_dedup
    from etl_processes_spark.ops.pack import shuffle_deterministic

    docs = spark.createDataFrame(
        [(0, "shared line\nunique zero"), (1, "shared line\nunique one"),
         (2, ""), (3, None)],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, "doc_id", "text").collect()}
    assert out[0]["clean_text"] == "unique zero"
    assert out[1]["clean_text"] == "unique one"
    # null/empty text rows survive (empty normalizes to the shared '' hash)
    assert 2 in out and 3 in out

    df = spark.range(50).withColumnRenamed("id", "k")
    ordered = [r["k"] for r in shuffle_deterministic(df, "k", seed=3).collect()]
    assert sorted(ordered) == list(range(50))

    emb = spark.createDataFrame([(0, [0.5, -0.5]), (1, [1.0, 1.0])], ["id", "v"])
    scored = score_with_classifier(emb, "v", [0.3, 0.7], 0.1).collect()
    assert all(0.0 <= r["clf_score"] <= 1.0 for r in scored)
