"""Multimodal column plumbing: images/audio/video as opaque binary columns.

The Spark-side contract is real and tested — schema, partitioning, Arrow
batch shapes, UDF signatures; only the media DECODE itself is stubbed
(this container ships no PIL/librosa/ffmpeg). The decode seam is a single
function swap: ``_decode_stub`` -> a real decoder with the same
(bytes, kind, meta) -> np.ndarray signature.

Design rules for 100 TB of media:
- payload is an opaque ``binary`` column + typed ``meta`` struct; never
  base64 strings (2x size), never driver-side bytes;
- decode/feature-extract runs in ``mapInPandas`` over Arrow record
  batches: one Python worker call per ~10k rows, zero per-row overhead;
  batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  so a partition of 100 MB payloads cannot OOM the worker;
- frame sampling emits (media_id, frame_no) rows via a columnar
  ``sequence``/``explode`` — the decoder then touches only sampled frames.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", META_SCHEMA),
    ]
)

N_FEATURES = 16


def synthetic_media_df(
    spark: SparkSession, n_rows: int, seed: int = 42
) -> DataFrame:
    """Deterministic fake media: payload bytes derived columnar-ly from the
    row id (unhex of chained md5) — stands in for real blobs in tests."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    # md5-derived kind index (not xxhash64): every engine has md5, so the
    # DuckDB oracle regenerates identical rows
    kidx = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col("id"), F.lit(seed), F.lit("kind"))),
                1, 2,
            ),
            16, 10,
        ).cast("int") % 3 + 1
    )
    payload = F.unhex(
        F.concat(
            F.md5(F.concat_ws("#", F.col("id"), F.lit(seed))),
            F.md5(F.concat_ws("#", F.col("id"), F.lit(seed + 1))),
        )
    )
    return spark.range(n_rows).select(
        F.format_string("m%08d", F.col("id").cast("int")).alias("media_id"),
        F.element_at(kinds, kidx).alias("kind"),
        payload.alias("payload"),
        F.struct(
            (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(1920)) + 1)
            .cast("int").alias("width"),
            (F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.lit(1080)) + 1)
            .cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.xxhash64("id", F.lit(seed + 4)), F.lit(60000)) + 1)
            .cast("int").alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB decoder: deterministic pseudo-features from the payload hash.

    Swap point for a real decoder (PIL.Image.open / librosa.load /
    pyav frame grab) — same signature, same N_FEATURES output. The real
    libraries are absent from this container by design.
    """
    # hash the payload's lowercase hex (not raw bytes): every SQL engine
    # can recompute sha256 over a hex VARCHAR, so the stub features are
    # oracle-checkable end to end
    digest = hashlib.sha256(payload.hex().encode()).digest()
    raw = np.frombuffer(digest[: N_FEATURES * 2], dtype=np.uint16)
    return (raw.astype(np.float32) / 65535.0)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def decode_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batch iterator).

    The iterator shape means one pandas DataFrame per Arrow batch — the
    Python worker never sees more than a batch of payloads at once."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "features": feats,
                }
            )

    return df.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_offsets(
    df: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Sample frame timestamps for video rows: (media_id, frame_ms) — pure
    columnar sequence/explode; the decoder later seeks only these."""
    vids = df.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ms"),
    )
