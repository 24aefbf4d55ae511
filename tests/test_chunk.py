"""Sliding-window chunking (jitsu_spark/text/chunk.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jitsu_spark.text.chunk import chunk_documents


def _py_chunks(text: str, window: int, stride: int):
    if not text:
        return []
    w = text.split(" ")
    n = len(w)
    ls = max(n - window + 1, 1)
    starts = list(range(1, ls + 1, stride))
    if starts[-1] != ls:
        starts.append(ls)
    return [
        (
            no,
            min(window, n - s + 1),
            " ".join(w[s - 1 : s - 1 + window]),
        )
        for no, s in enumerate(starts)
    ]


@pytest.mark.parametrize(
    "n_tokens,window,stride",
    [
        (5, 8, 4),   # shorter than window -> one whole-doc chunk
        (8, 8, 4),   # exactly one full window
        (12, 8, 4),  # aligned tail: starts 1, 5
        (14, 8, 4),  # realigned tail: starts 1, 5, 7
        (30, 8, 8),  # disjoint chunks, realigned tail
        (30, 8, 3),  # dense overlap
        (1, 4, 2),   # single token
    ],
)
def test_matches_python_oracle(spark, n_tokens, window, stride):
    text = " ".join(f"t{i}" for i in range(n_tokens))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(
        (r["chunk_no"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, window, stride).collect()
    )
    assert got == _py_chunks(text, window, stride)


def test_every_token_covered_and_full_width(spark):
    text = " ".join(f"t{i}" for i in range(100))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(docs, 16, 10).collect()
    # all chunks full-width when n >= window
    assert all(r["n_tokens"] == 16 for r in rows)
    covered = set()
    for r in rows:
        covered.update(r["chunk_text"].split(" "))
    assert covered == set(text.split(" "))


def test_empty_and_null_docs_yield_no_chunks(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "a b")], "doc_id long, text string"
    )
    rows = chunk_documents(docs, 4, 2).collect()
    assert [(r["doc_id"], r["chunk_text"]) for r in rows] == [(3, "a b")]


def test_chunking_is_zero_shuffle(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    out = chunk_documents(docs, 4, 2)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rejects_bad_params(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, 0, 1)
    with pytest.raises(ValueError):
        chunk_documents(docs, 4, 0)


def test_chunk_encode_pack_composition(spark):
    """chunk -> vocab-encode -> pack composes into the training-data
    shape: disjoint chunks of every doc, encoded against the corpus
    vocab, packed into fixed-length sequences that tile the chunk-ordered
    global token stream."""
    from jitsu_spark.text.packing import pack_tokens
    from jitsu_spark.text.vocab import build_vocab, encode_documents

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i + j) % 11}" for j in range(50))) for i in range(20)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, 16, 16).select(
        (F.col("doc_id") * 1000 + F.col("chunk_no")).alias("cid"),
        F.col("chunk_text"),
    )
    vocab = build_vocab(docs, 64)
    enc = encode_documents(chunks, vocab, id_col="cid", text_col="chunk_text")
    packs = pack_tokens(enc, doc_col="cid", tokens_col="token_ids", max_len=32)
    rows = sorted(packs.collect(), key=lambda r: r["pack_id"])
    total = sum(r["n_tok"] for r in rows)
    exp_stream = [
        t
        for r in sorted(enc.collect(), key=lambda r: r["cid"])
        for t in r["token_ids"]
    ]
    assert total == len(exp_stream)
    assert all(r["n_tok"] == 32 for r in rows[:-1])
    got_stream = [t for r in rows for t in r["tokens"]]
    assert got_stream == exp_stream


def test_rejects_stride_gt_window(spark):
    """stride > window would leave tokens uncovered between consecutive
    chunks — refused rather than silently violating the coverage
    contract."""
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="gapless"):
        chunk_documents(docs, 4, 5)
