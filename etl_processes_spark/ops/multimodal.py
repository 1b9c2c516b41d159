"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched mapInPandas.

Driver-mandated extension (no reference counterpart). The decode kernels
themselves are STUBBED — PIL/ffmpeg are not in this container — behind
``_decode_image_real`` (raises NotImplementedError) with a deterministic fake
(``fake_decode=True``, the default) so the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested. Swap the
kernel for a real codec on a cluster with the libs installed; nothing else
changes.

Scale notes: media bytes stay in executor memory one Arrow batch at a time
(tune spark.sql.execution.arrow.maxRecordsPerBatch for large blobs); feature
outputs are small fixed-width vectors, so the shuffle after extraction
carries features, never raw media. Repartition by size-bucket before decode
to even out skew from mixed blob sizes.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),       # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),       # images/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),    # audio/video
        T.StructField("content", T.BinaryType(), True),      # opaque payload
    ]
)


def make_fake_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests: payload bytes derived
    from md5(media_id), metadata derived from the id."""
    rows = []
    for i in range(n):
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        kind = ("image", "audio", "video")[i % 3]
        payload = (h * ((64 + i % 17) // len(h) + 1))[: 64 + i % 17]
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                32 + (i % 8) * 16 if kind != "audio" else None,
                32 + (i % 5) * 16 if kind != "audio" else None,
                1000 * (i % 30 + 1) if kind != "image" else None,
                bytearray(payload),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_from_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_chars_col: str = "n_chars",
) -> DataFrame:
    """Deterministic media table DERIVED from the documents parquet: payload
    = utf-8 text bytes, kind/mime/dims/duration pure functions of the id and
    length. Every column is a plain expression over real testdata, so
    metadata-only operators over it (media_stats, frame_sample_plan) are
    SQL-expressible and hash-gated against DuckDB — unlike the in-session
    fake table, which no oracle can see."""
    did = F.col(id_col)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (did % 3).cast("int") + 1,
    )
    return docs.select(
        did.alias("media_id"),
        kind.alias("kind"),
        F.when(kind == "image", "image/png")
        .when(kind == "audio", "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.when(kind != "audio", (32 + (did % 8) * 16).cast("int")).alias("width"),
        F.when(kind != "audio", (32 + (did % 5) * 16).cast("int")).alias("height"),
        F.when(kind != "image", 1000 * (F.col(n_chars_col) % 30 + 1)).alias("duration_ms"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
    )


def _decode_image_real(content: bytes) -> np.ndarray:
    raise NotImplementedError(
        "real image decode requires PIL/opencv (not in this container); "
        "install and replace this kernel"
    )


def _fake_features(content: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for decode→feature-extract: Box-Muller normals
    over md5 hex slices of the payload (+1-byte block markers). Same
    signature/shape as a real embedding kernel — and computable identically
    in DuckDB when the payload is utf-8 text (md5(text || chr(k)) over
    VARCHAR hashes the same bytes), which is what hash-gates the
    multimodal_features query against the oracle."""
    import math

    if content is None:
        return np.zeros(dim)
    b = bytes(content)
    out = np.empty(dim)
    h1 = h2 = None
    for c in range(dim):
        block, j = divmod(c, 8)
        if j == 0:
            h1 = hashlib.md5(b + bytes([2 * block + 1])).hexdigest()
            h2 = hashlib.md5(b + bytes([2 * block + 2])).hexdigest()
        u1 = (int(h1[4 * j : 4 * j + 4], 16) + 0.5) / 65536.0
        u2 = (int(h2[4 * j : 4 * j + 4], 16) + 0.5) / 65536.0
        out[c] = math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2)
    return out


FEATURE_DIM = 16

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(
    media: DataFrame,
    dim: int = FEATURE_DIM,
    fake_decode: bool = True,
    kernel=None,
) -> DataFrame:
    """media table → (media_id, kind, n_bytes, features[dim]) via
    mapInPandas. The batch iterator shape is exactly what a real decoder
    needs; only the kernel is swapped.

    KERNEL CONTRACT (pinned by tests/test_multimodal.py): a plain callable
    ``kernel(content: bytes | None) -> np.ndarray`` returning shape (dim,)
    float64, deterministic for equal bytes, defined for None (missing
    payload). Swap procedure on a cluster with codec libs installed::

        def pil_kernel(content):
            if content is None: return np.zeros(DIM)
            img = PIL.Image.open(io.BytesIO(content)) ...
        extract_features(media, dim=DIM, kernel=pil_kernel)

    The callable must be picklable (top-level function) — it ships to
    executors inside the mapInPandas closure. Nothing else changes: schema,
    Arrow batching, and partitioning are kernel-agnostic."""
    if kernel is None:
        kernel = (
            (lambda c: _fake_features(c, dim)) if fake_decode else _decode_image_real
        )

    def run(batches):
        for pdf in batches:
            feats = [np.asarray(kernel(c), dtype=np.float64).tolist() for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=_FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per (media_id, frame_ts_ms)
    — pure Spark (sequence + explode), no decode needed to build the work
    list. A real pipeline joins this plan back to content and decodes only
    the sampled frames."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind payload stats — metadata-only, never touches content bytes
    beyond length (column pruning keeps the binary column unread when the
    source format supports it)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.avg(F.length("content")).alias("avg_bytes"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )
