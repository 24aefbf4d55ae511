"""Incrementally maintained chunk table (text/chunk_ivm.py) vs the batch
chunking (text/chunk.py) after every upstream batch — inserts, growing
and SHRINKING updates (out-of-range chunk_no retraction), deletes,
persisted window/stride, and frozen-vocab encode composition."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jitsu_spark.lake.merge import merge_batch
from jitsu_spark.lake.table import LakeTable
from jitsu_spark.text.chunk import chunk_documents
from jitsu_spark.text.chunk_ivm import (
    create_chunk_table,
    load_chunk_table,
    sync_chunks,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

W, S = 4, 3


def _words(n, tag=""):
    return " ".join(f"w{tag}{i}" for i in range(n))


def _mk_src(spark, root):
    return LakeTable.create(
        spark, root, DOC_SCHEMA, "doc_id", n_buckets=8,
        properties={"write.mode": "mor"},
    )


def _apply(src, spark, rows, seq0):
    data = [(int(d), t, seq0 + i, op) for i, (d, t, op) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "doc_id long, text string, seq long, op string"
    )
    merge_batch(src, df, batch_id=f"b{seq0}", job_id="up")


def _expected(src):
    return {
        (r["doc_id"], r["chunk_no"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(
            src.read().select("doc_id", "text"), W, S
        ).collect()
    }


def _actual(table):
    return {
        (r["doc_id"], r["chunk_no"], r["n_tokens"], r["chunk_text"])
        for r in table.read()
        .select("doc_id", "chunk_no", "n_tokens", "chunk_text")
        .collect()
    }


def test_chunk_table_tracks_batch_answer(spark, tmpdir_path):
    """Per-batch parity incl. the shrink case: doc 1 goes 12 tokens -> 3
    tokens, so its chunk_no >= 1 rows exist only in the pre-image and
    must retract."""
    src = _mk_src(spark, os.path.join(tmpdir_path, "src"))
    chunks = create_chunk_table(
        spark, os.path.join(tmpdir_path, "ch"), window=W, stride=S,
        n_buckets=8,
    )
    batches = [
        [(1, _words(12, "a"), "u"), (2, _words(5, "b"), "u"),
         (3, "", "u")],                       # empty text -> zero chunks
        [(1, _words(3, "c"), "u"), (4, _words(9, "d"), "u")],  # shrink
        [(2, None, "d"), (1, _words(20, "e"), "u")],           # grow back
    ]
    seq = 0
    for b in batches:
        _apply(src, spark, b, seq)
        seq += len(b)
        res = sync_chunks(src, chunks)
        assert not res.skipped
        assert _actual(chunks) == _expected(src)
    # steady redelivery is a no-op
    v = chunks.snapshot().version
    assert sync_chunks(src, chunks).skipped
    assert chunks.snapshot().version == v


def test_params_persisted_and_guards(spark, tmpdir_path):
    src = _mk_src(spark, os.path.join(tmpdir_path, "src"))
    chunks = create_chunk_table(
        spark, os.path.join(tmpdir_path, "ch"), window=W, stride=S,
        n_buckets=8,
    )
    _apply(src, spark, [(1, _words(10), "u")], 0)
    sync_chunks(src, chunks)
    # a fresh load syncs under the persisted window/stride, not defaults
    reloaded = load_chunk_table(spark, os.path.join(tmpdir_path, "ch"))
    _apply(src, spark, [(2, _words(7), "u")], 1)
    sync_chunks(src, reloaded)
    assert _actual(reloaded) == _expected(src)
    with pytest.raises(ValueError):
        load_chunk_table(spark, os.path.join(tmpdir_path, "src"))
    with pytest.raises(ValueError):
        create_chunk_table(
            spark, os.path.join(tmpdir_path, "bad"), window=4, stride=5
        )


def test_frozen_vocab_encode_over_fresh_chunks(spark, tmpdir_path):
    """Downstream composition: the continuously-fresh chunk table feeds
    the frozen-vocab encoder — the training-data surface a consumer
    would read after every sync."""
    from jitsu_spark.text.vocab import encode_documents

    src = _mk_src(spark, os.path.join(tmpdir_path, "src"))
    chunks = create_chunk_table(
        spark, os.path.join(tmpdir_path, "ch"), window=W, stride=S,
        n_buckets=8,
    )
    _apply(src, spark, [(1, "a b c d e f", "u"), (2, "b c x", "u")], 0)
    sync_chunks(src, chunks)
    vocab = spark.createDataFrame(
        [(w, i) for i, w in enumerate(["a", "b", "c", "d", "e", "f"])],
        "token string, token_id long",
    )
    enc = encode_documents(
        chunks.read().select(
            F.col("ck").alias("doc_id"), F.col("chunk_text").alias("text")
        ),
        vocab,
    )
    got = {r["doc_id"]: r["n_oov"] for r in enc.collect()}
    assert got["2#0"] == 1          # 'x' is OOV in the frozen vocab
    assert all(v == 0 for k, v in got.items() if k.startswith("1#"))
