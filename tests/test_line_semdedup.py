"""line_dedup (boilerplate-line removal), semantic_dedup (SemDeDup-style)
and shuffle_deterministic — corpus-hygiene extensions, round 4."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_processes_spark.ops.dedup import line_dedup
from etl_processes_spark.ops.pack import shuffle_deterministic
from etl_processes_spark.ops.similarity import semantic_dedup

LDOCS = [
    (0, "common header\nunique zero\ncommon footer"),
    (1, "Common   HEADER!!\nunique one\ncommon footer"),  # normalized dup line
    (2, "common header\nunique two"),
    (3, "all original content\nnothing shared"),
    (4, "common header"),  # every line is boilerplate
]


@pytest.fixture(scope="module")
def ldocs(spark):
    return spark.createDataFrame(LDOCS, ["doc_id", "text"])


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_line_dedup_drops_frequent_lines(ldocs):
    out = _rows(line_dedup(ldocs, "doc_id", "text", max_doc_freq=1))
    assert out[0]["clean_text"] == "unique zero"
    assert out[1]["clean_text"] == "unique one"
    assert out[2]["clean_text"] == "unique two"
    # doc 3 untouched — its lines are unique
    assert out[3]["clean_text"] == "all original content\nnothing shared"
    # doc 4 survives as a row with empty text
    assert out[4]["clean_text"] == ""
    assert out[4]["n_lines"] == 1 and out[4]["n_lines_kept"] == 0
    assert out[0]["n_lines"] == 3 and out[0]["n_lines_kept"] == 1


def test_line_dedup_threshold(ldocs):
    # max_doc_freq=2: "common footer" (2 docs) survives, "common header"
    # (4 docs counting the normalized variant) still drops
    out = _rows(line_dedup(ldocs, "doc_id", "text", max_doc_freq=2))
    assert out[0]["clean_text"] == "unique zero\ncommon footer"
    assert out[1]["clean_text"] == "unique one\ncommon footer"


def test_line_dedup_order_preserved(spark):
    df = spark.createDataFrame(
        [(0, "z last\na first\nz last again"), (1, "kept\nkept too")],
        ["doc_id", "text"],
    )
    out = _rows(line_dedup(df, "doc_id", "text", max_doc_freq=1))
    # in-doc order restored (not alphabetical), all lines unique here
    assert out[0]["clean_text"] == "z last\na first\nz last again"


def test_line_dedup_repeated_line_within_one_doc(spark):
    # a line repeated within ONE doc is not boilerplate (distinct-doc count 1)
    df = spark.createDataFrame(
        [(0, "dup\ndup\nbody"), (1, "other")], ["doc_id", "text"]
    )
    out = _rows(line_dedup(df, "doc_id", "text", max_doc_freq=1))
    assert out[0]["clean_text"] == "dup\ndup\nbody"


def _vec(*xs):
    v = np.zeros(8)
    for i, x in enumerate(xs):
        v[i] = x
    return [float(f) for f in v]


SEMS = [
    (0, _vec(1.0)),
    (1, _vec(1.0)),            # exact dup of 0
    (2, _vec(1.0, 0.1)),       # cos ~0.995 with 0
    (3, _vec(0.0, 1.0)),       # distinct direction
    (4, _vec(0.0, 0.0, 1.0)),  # distinct direction
    (5, _vec(0.0, 0.0, 2.0)),  # scaled dup of 4 (cos = 1)
]


@pytest.fixture(scope="module")
def sems(spark):
    return spark.createDataFrame(SEMS, ["vec_id", "embedding"])


def test_semantic_dedup_keep_flags(sems):
    out = {r["vec_id"]: r for r in semantic_dedup(
        sems, "vec_id", "embedding", threshold=0.97, n_centroids=3, seed=7
    ).collect()}
    assert len(out) == 6  # every vector present
    assert out[0]["keep"] and not out[1]["keep"] and not out[2]["keep"]
    assert out[3]["keep"]
    assert out[4]["keep"] and not out[5]["keep"]


def test_semantic_dedup_blocked_path(sems):
    # block_rows smaller than cell size exercises the blocked GEMM loop;
    # result must be identical
    a = semantic_dedup(sems, "vec_id", "embedding", threshold=0.97,
                       n_centroids=3, seed=7).collect()
    b = semantic_dedup(sems, "vec_id", "embedding", threshold=0.97,
                       n_centroids=3, seed=7, block_rows=2).collect()
    key = lambda rows: sorted((r["vec_id"], r["keep"]) for r in rows)
    assert key(a) == key(b)


def test_semantic_dedup_high_threshold_keeps_near(sems):
    # at threshold above cos(0,2)=0.995 the near-dup 2 survives, exact dups don't
    out = {r["vec_id"]: r for r in semantic_dedup(
        sems, "vec_id", "embedding", threshold=0.999, n_centroids=3, seed=7
    ).collect()}
    assert out[2]["keep"]
    assert not out[1]["keep"] and not out[5]["keep"]


def test_shuffle_deterministic(spark):
    df = spark.range(500).withColumnRenamed("id", "doc_id")
    a = [r["doc_id"] for r in shuffle_deterministic(df, "doc_id", seed=1).collect()]
    b = [r["doc_id"] for r in shuffle_deterministic(df, "doc_id", seed=1).collect()]
    c = [r["doc_id"] for r in shuffle_deterministic(df, "doc_id", seed=2).collect()]
    assert a == b                      # reproducible
    assert a != c                      # seed changes the order
    assert sorted(a) == list(range(500))  # a permutation
    assert a != list(range(500))       # actually shuffled

    # rank matches the md5 definition for a spot row
    import hashlib
    expect = int(hashlib.md5(b"7:1").hexdigest()[:15], 16)
    row = shuffle_deterministic(df, "doc_id", seed=1).filter(F.col("doc_id") == 7).first()
    assert row["shuffle_rank"] == expect


def test_line_dedup_incremental_flow(spark):
    from etl_processes_spark.ops.dedup import line_dedup, line_dedup_incremental

    b1 = spark.createDataFrame(
        [(0, "banner\ndoc zero body"), (1, "banner\ndoc one body")],
        ["doc_id", "text"],
    )
    b2 = spark.createDataFrame(
        [(2, "banner\ndoc two body"), (3, "fresh\nno shared lines")],
        ["doc_id", "text"],
    )
    # cold start: banner hits 2 docs in batch 1 → dropped there already
    c1, d1 = line_dedup_incremental(b1, None, "doc_id", "text", max_doc_freq=1)
    out1 = {r["doc_id"]: r["clean_text"] for r in c1.collect()}
    assert out1[0] == "doc zero body" and out1[1] == "doc one body"

    # batch 2: banner appears in ONE doc here, but state says df=2 → still dropped
    c2, d2 = line_dedup_incremental(b2, d1, "doc_id", "text", max_doc_freq=1)
    out2 = {r["doc_id"]: r["clean_text"] for r in c2.collect()}
    assert out2[2] == "doc two body"
    assert out2[3] == "fresh\nno shared lines"

    # incremental result equals batch line_dedup over the full corpus
    full = {r["doc_id"]: r["clean_text"]
            for r in line_dedup(b1.unionByName(b2), "doc_id", "text").collect()}
    assert {**out1, **out2} == full

    # state delta is per-batch: appending d1+d2 and re-running batch 2 is
    # deterministic (replay yields the identical cleaned output)
    state = d1.unionByName(d2)
    c2b, _ = line_dedup_incremental(b2, d1, "doc_id", "text", max_doc_freq=1)
    assert {r["doc_id"]: r["clean_text"] for r in c2b.collect()} == out2
    assert state.groupBy("__h").count().count() > 0


def test_line_dedup_incremental_cross_batch_threshold(spark):
    from etl_processes_spark.ops.dedup import line_dedup_incremental

    # a banner arriving one-doc-per-batch crosses max_doc_freq=2 on batch 3
    batches = [
        spark.createDataFrame([(i, "slow banner\nbody %d" % i)], ["doc_id", "text"])
        for i in range(3)
    ]
    state = None
    outs = {}
    for b in batches:
        cleaned, delta = line_dedup_incremental(
            b, state, "doc_id", "text", max_doc_freq=2
        )
        for r in cleaned.collect():
            outs[r["doc_id"]] = r["clean_text"]
        state = delta if state is None else state.unionByName(delta)
    assert outs[0] == "slow banner\nbody 0"   # df=1 at the time
    assert outs[1] == "slow banner\nbody 1"   # df=2 — at the threshold
    assert outs[2] == "body 2"                # df=3 > 2 → dropped


SPAN = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens


def test_remove_duplicate_spans(spark):
    from etl_processes_spark.ops.dedup import remove_duplicate_spans

    docs = spark.createDataFrame(
        [
            (0, f"intro words here {SPAN} closing remarks now"),
            (1, f"different opening {SPAN} and a different ending"),
            (2, "wholly original text with no copied passage inside it"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(
        docs, "doc_id", "text", k=8, min_df=2
    ).collect()}
    # the shared 8-token span vanishes from BOTH docs; surrounding text stays
    assert out[0]["clean_text"] == "intro words here closing remarks now"
    assert out[1]["clean_text"] == "different opening and a different ending"
    assert out[2]["clean_text"] == "wholly original text with no copied passage inside it"
    assert out[3]["clean_text"] == "" and out[3]["n_tokens"] == 0
    assert out[0]["n_dup_windows"] == 1 and out[2]["n_dup_windows"] == 0
    assert out[0]["n_tokens_kept"] == out[0]["n_tokens"] - 8


def test_remove_duplicate_spans_overlapping_windows_merge(spark):
    from etl_processes_spark.ops.dedup import remove_duplicate_spans

    # a 10-token shared passage spawns 3 overlapping k=8 windows whose
    # coverage must merge into one contiguous removed span
    passage = SPAN + " india juliett"
    docs = spark.createDataFrame(
        [(0, f"aa bb {passage} cc dd"), (1, f"xx {passage} yy")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["clean_text"] for r in remove_duplicate_spans(
        docs, "doc_id", "text", k=8, min_df=2
    ).collect()}
    assert out[0] == "aa bb cc dd"
    assert out[1] == "xx yy"


def test_remove_duplicate_spans_within_doc_repeat_not_removed(spark):
    from etl_processes_spark.ops.dedup import remove_duplicate_spans

    # min_df counts DISTINCT docs: a span repeated within one doc survives
    docs = spark.createDataFrame(
        [(0, f"{SPAN} middle {SPAN}"), (1, "unrelated text entirely")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(
        docs, "doc_id", "text", k=8, min_df=2
    ).collect()}
    assert out[0]["n_dup_windows"] == 0
    assert "alpha" in out[0]["clean_text"]


# hypothesis: dedup invariants under random corpora ---------------------------

from hypothesis import given, settings, strategies as st

_WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "fox", "golf", "hotel"]
_line = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=4).map(" ".join)
_doc = st.lists(_line, min_size=1, max_size=5).map("\n".join)


@settings(max_examples=10, deadline=None, derandomize=True)
@given(st.lists(_doc, min_size=2, max_size=6), st.integers(1, 3))
def test_line_dedup_idempotent_and_conservative(spark, docs, max_df):
    from etl_processes_spark.ops.dedup import line_dedup

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    once = line_dedup(df, "doc_id", "text", max_doc_freq=max_df)
    rows1 = {r["doc_id"]: r for r in once.collect()}

    # conservative: kept lines are a subsequence of the original lines
    for i, text in enumerate(docs):
        orig = text.split("\n")
        kept = rows1[i]["clean_text"].split("\n") if rows1[i]["clean_text"] else []
        it = iter(orig)
        assert all(any(k == o for o in it) for k in kept), (kept, orig)
        assert rows1[i]["n_lines"] == len(orig)
        assert rows1[i]["n_lines_kept"] == len(kept)

    # idempotent: cleaning the cleaned corpus changes nothing (a removed
    # line cannot resurrect, a kept line's df can only stay or shrink)
    again = line_dedup(
        once.select("doc_id", F.col("clean_text").alias("text")),
        "doc_id", "text", max_doc_freq=max_df,
    )
    rows2 = {r["doc_id"]: r["clean_text"] for r in again.collect()}
    for i in rows1:
        expect = rows1[i]["clean_text"]
        # cleaning '' re-splits to one empty line shared by all empty docs;
        # those normalize to the same hash but produce '' again either way
        assert rows2[i] == expect


@settings(max_examples=10, deadline=None, derandomize=True)
@given(st.lists(st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12)
                .map(" ".join), min_size=2, max_size=5),
       st.integers(2, 4))
def test_remove_duplicate_spans_conservative(spark, docs, k):
    from etl_processes_spark.ops.dedup import remove_duplicate_spans

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    out = {r["doc_id"]: r for r in remove_duplicate_spans(
        df, "doc_id", "text", k=k, min_df=2
    ).collect()}
    for i, text in enumerate(docs):
        toks = text.split() if text else []
        kept = out[i]["clean_text"].split() if out[i]["clean_text"] else []
        # kept tokens are a subsequence of the originals
        it = iter(toks)
        assert all(any(t == o for o in it) for t in kept)
        assert out[i]["n_tokens"] == len(toks)
        assert out[i]["n_tokens_kept"] == len(kept)
        assert 0 <= out[i]["n_dup_windows"] <= max(0, len(toks) - k + 1)


def test_remove_duplicate_spans_partition_invariant(spark):
    from etl_processes_spark.ops.dedup import remove_duplicate_spans

    span = "alpha bravo charlie delta echo foxtrot golf hotel"
    docs = [(i, f"filler {i} words {span} trailing {i}") for i in range(20)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    a = sorted(map(tuple, remove_duplicate_spans(df, "doc_id", "text", k=8).collect()))
    b = sorted(map(tuple, remove_duplicate_spans(
        df.repartition(11), "doc_id", "text", k=8
    ).collect()))
    assert a == b
