"""Incrementally maintained corpus statistics (text/term_stats.py) vs
full recomputes after every upstream batch — inserts, updates, deletes,
empty/NULL text, vocabulary shrink, and model-reconstruction parity."""

from __future__ import annotations

import math
import os
import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from jitsu_spark.lake.merge import merge_batch
from jitsu_spark.lake.table import LakeTable
from jitsu_spark.text.term_stats import (
    bigram_model_from_stats,
    create_corpus_stats,
    idf_frame,
    sync_corpus_stats,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


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
    """Full recompute of (stats, n_docs, bigram counts) in plain Python
    from the upstream's current state."""
    docs = [
        (r["doc_id"], r["text"])
        for r in src.read().collect()
        if r["text"] is not None and r["text"] != ""
    ]
    stats: dict[str, list[int]] = {}
    bigrams: dict[str, int] = {}
    for _, text in docs:
        toks = text.split(" ")
        seen: dict[str, int] = {}
        for t in toks:
            seen[t] = seen.get(t, 0) + 1
        for t, c in seen.items():
            df_tf = stats.setdefault(t, [0, 0])
            df_tf[0] += 1
            df_tf[1] += c
        for a, b in zip(toks, toks[1:]):
            bigrams[f"{a} {b}"] = bigrams.get(f"{a} {b}", 0) + 1
    return (
        {t: tuple(v) for t, v in stats.items()},
        len(docs),
        bigrams,
    )


def _actual(tables):
    stats = {
        r["token"]: (r["df"], r["tf"])
        for r in tables["stats"].read().collect()
    }
    meta = {r["scope"]: r["n_docs"] for r in tables["meta"].read().collect()}
    bg = {r["bigram"]: r["c"] for r in tables["bigrams"].read().collect()}
    return stats, meta.get("corpus", 0), bg


def test_corpus_stats_match_full_recompute_over_batches(spark, tmpdir_path):
    src = _mk_src(spark, os.path.join(tmpdir_path, "up"))
    tables = create_corpus_stats(
        spark, os.path.join(tmpdir_path, "stats"), n_buckets=8
    )
    # batch 1: inserts incl. repeated tokens, empty and NULL docs
    _apply(src, spark, [
        (1, "the cat sat on the mat", "u"),
        (2, "the dog sat", "u"),
        (3, "", "u"),
        (4, None, "u"),
    ], 100)
    sync_corpus_stats(src, tables)
    assert _actual(tables) == _expected(src)

    # batch 2: update doc 1 (token set changes), delete doc 2
    _apply(src, spark, [
        (1, "a cat on a hot tin roof", "u"),
        (2, None, "d"),
    ], 200)
    sync_corpus_stats(src, tables)
    assert _actual(tables) == _expected(src)
    stats, n, bg = _actual(tables)
    assert "dog" not in stats  # df hit 0 -> row deleted, V shrinks

    # batch 3: delete everything -> all tables empty
    _apply(src, spark, [(1, None, "d"), (3, None, "d")], 300)
    sync_corpus_stats(src, tables)
    assert _actual(tables) == ({}, 0, {})

    # batch 4: re-insert after empty
    _apply(src, spark, [(7, "x y x", "u")], 400)
    sync_corpus_stats(src, tables)
    assert _actual(tables) == ({"x": (1, 2), "y": (1, 1)}, 1, {
        "x y": 1, "y x": 1,
    })


def test_corpus_stats_randomized_batches(spark, tmpdir_path):
    rnd = random.Random(43)
    vocab = ["w%d" % i for i in range(9)]
    src = _mk_src(spark, os.path.join(tmpdir_path, "up"))
    tables = create_corpus_stats(
        spark, os.path.join(tmpdir_path, "stats"), n_buckets=8
    )
    live: set[int] = set()
    seq = 0
    for _ in range(4):
        rows = []
        for _ in range(rnd.randint(2, 6)):
            if live and rnd.random() < 0.3:
                d = rnd.choice(sorted(live))
                rows.append((d, None, "d"))
                live.discard(d)
            else:
                d = rnd.randint(1, 12)
                text = " ".join(
                    rnd.choice(vocab) for _ in range(rnd.randint(0, 8))
                )
                rows.append((d, text, "u"))
                live.add(d)
        _apply(src, spark, rows, seq)
        seq += 100
        sync_corpus_stats(src, tables)
        assert _actual(tables) == _expected(src)


def test_idf_frame_values(spark, tmpdir_path):
    src = _mk_src(spark, os.path.join(tmpdir_path, "up"))
    tables = create_corpus_stats(
        spark, os.path.join(tmpdir_path, "stats"), n_buckets=8,
        with_bigrams=False,
    )
    _apply(src, spark, [
        (1, "a b", "u"), (2, "a c", "u"), (3, "a b c d", "u"),
    ], 100)
    sync_corpus_stats(src, tables)
    got = {r["token"]: r["idf_e6"]
           for r in idf_frame(tables["stats"], tables["meta"]).collect()}
    want = {
        t: int(round((math.log((1 + 3) / (1 + df)) + 1) * 1e6))
        for t, df in {"a": 3, "b": 2, "c": 2, "d": 1}.items()
    }
    assert got == want


def test_bigram_model_from_stats_equals_fresh_model(spark, tmpdir_path):
    """Scoring with the incrementally maintained model == scoring with a
    model trained from scratch on the current corpus, after updates AND
    deletes reshaped the counts."""
    from jitsu_spark.text.lm import bigram_model, score_documents

    src = _mk_src(spark, os.path.join(tmpdir_path, "up"))
    tables = create_corpus_stats(
        spark, os.path.join(tmpdir_path, "stats"), n_buckets=8
    )
    _apply(src, spark, [
        (1, "the cat sat on the mat", "u"),
        (2, "the cat ran off the mat", "u"),
        (3, "dogs bark at the cat", "u"),
    ], 100)
    sync_corpus_stats(src, tables)
    _apply(src, spark, [
        (2, "the cat sat on the dog", "u"),
        (3, None, "d"),
    ], 200)
    sync_corpus_stats(src, tables)

    corpus = src.read().select("doc_id", "text")
    probe = spark.createDataFrame(
        [(10, "the cat sat quietly"), (11, "zz qq ww"), (12, "")],
        "doc_id long, text string",
    )
    fresh = {
        r["doc_id"]: (r["n_bigrams"], r["sum_nll_e8"])
        for r in score_documents(probe, bigram_model(corpus)).collect()
    }
    ivm = {
        r["doc_id"]: (r["n_bigrams"], r["sum_nll_e8"])
        for r in score_documents(
            probe,
            bigram_model_from_stats(tables["bigrams"], tables["stats"]),
        ).collect()
    }
    assert ivm == fresh


def test_cdc_stream_keeps_corpus_stats_fresh(spark, tmpdir_path):
    """End-to-end streaming composition: the corpus statistics tables
    (df/tf, N, bigram counts) sync through post_commit after every
    applied micro-batch, so the idf/LM model state is continuously fresh
    as the document stream lands; checkpoint redelivery leaves every
    table untouched."""
    from jitsu_spark.streaming import CdcStreamJob

    log_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
    ])
    src_dir = os.path.join(tmpdir_path, "log")
    b1 = [(1, "the cat sat", 0, "u"), (2, "the dog sat", 1, "u"),
          (3, "", 2, "u")]
    b2 = [(1, "a cat stood up", 3, "u"), (2, None, 4, "d"),
          (5, "the end", 5, "u")]
    for b in (b1, b2):
        spark.createDataFrame(b, log_schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), DOC_SCHEMA, "doc_id",
        n_buckets=4, properties={"write.mode": "mor"},
    )
    tables = create_corpus_stats(
        spark, os.path.join(tmpdir_path, "stats"), n_buckets=4
    )

    def make_job():
        return CdcStreamJob(
            table=table,
            source_dir=src_dir,
            checkpoint_dir=os.path.join(tmpdir_path, "ckpt"),
            source_schema=log_schema,
            max_files_per_trigger=1,
            job_id="doc-stream",
            post_commit=lambda bid: sync_corpus_stats(table, tables),
        )

    make_job().run_available_now(spark)
    assert _actual(tables) == _expected(table)
    versions = [t.snapshot().version for t in tables.values()]

    # redelivery: merges skip via manifest, stats tables untouched
    make_job().run_available_now(spark)
    assert [t.snapshot().version for t in tables.values()] == versions
    assert _actual(tables) == _expected(table)
