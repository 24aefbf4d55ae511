"""Per-document repetition-feature mirror (text/repetition.py IVM
surface) vs the batch repetition_signals after every upstream batch —
inserts, updates, NULL/empty text, deletes."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from jitsu_spark.lake.merge import merge_batch
from jitsu_spark.lake.table import LakeTable
from jitsu_spark.text.repetition import (
    create_features_table,
    repetition_signals,
    sync_repetition_features,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _apply(src, spark, rows, seq0):
    data = [(int(d), t, seq0 + i, op) for i, (d, t, op) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "doc_id long, text string, seq long, op string"
    )
    merge_batch(src, df, batch_id=f"b{seq0}", job_id="up")


def _rows(df):
    return {
        r["doc_id"]: (
            r["n_words"], r["n_distinct_words"], r["dup_word_frac"],
            r["top_word_frac"], r["top_bigram_frac"],
        )
        for r in df.collect()
    }


def test_feature_mirror_tracks_batch_signals(spark, tmpdir_path):
    src = LakeTable.create(
        spark, os.path.join(tmpdir_path, "src"), DOC_SCHEMA, "doc_id",
        n_buckets=8, properties={"write.mode": "mor"},
    )
    feats = create_features_table(
        spark, os.path.join(tmpdir_path, "f"), n_buckets=8
    )
    batches = [
        [(1, "a a b c", "u"), (2, "x y x y x", "u"), (3, "", "u"),
         (4, None, "u")],                       # empty + NULL text rows
        [(1, "q", "u"), (5, "m n m n", "u")],   # update + insert
        [(2, None, "d"), (3, "now real text", "u")],  # delete + fill-in
    ]
    seq = 0
    for b in batches:
        _apply(src, spark, b, seq)
        seq += len(b)
        res = sync_repetition_features(src, feats)
        assert not res.skipped
        want = _rows(repetition_signals(src.read().select("doc_id", "text")))
        assert _rows(feats.read()) == want
    assert 2 not in _rows(feats.read())  # deleted doc's row retracted
    # redelivery no-op
    v = feats.snapshot().version
    assert sync_repetition_features(src, feats).skipped
    assert feats.snapshot().version == v
