"""TF-IDF top-terms (jitsu_spark/text/tfidf.py)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from jitsu_spark.text.tfidf import tfidf_top_terms


def _py_oracle(corpus: dict, k: int):
    ne = {i: t for i, t in corpus.items() if t}
    n_docs = len(ne)
    tf = {i: Counter(t.split(" ")) for i, t in ne.items()}
    df = Counter(tok for c in tf.values() for tok in c)
    out = {}
    for i, c in tf.items():
        scored = [
            (
                tok,
                int(round(n * (math.log((1 + n_docs) / (1 + df[tok])) + 1.0) * 1e6)),
            )
            for tok, n in c.items()
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        out[i] = [(r + 1, tok, s) for r, (tok, s) in enumerate(scored[:k])]
    return out


def test_matches_python_oracle(spark):
    corpus = {
        1: "apple banana apple cherry",
        2: "banana banana durian",
        3: "apple elderberry fig grape honeydew kiwi",
        4: "",
        5: None,
    }
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {}
    for r in tfidf_top_terms(docs, 3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["term_rank"], r["token"], r["score_e6"])
        )
    for v in got.values():
        v.sort()
    exp = _py_oracle(corpus, 3)
    assert got == {i: v for i, v in exp.items() if v}


def test_rare_term_outranks_common_term(spark):
    # "common" appears in every doc, "rare" in one: for doc 1 (tf equal)
    # the rare term must rank first.
    rows = [(1, "common rare")] + [(i, "common filler") for i in range(2, 12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r1 = [
        r["token"]
        for r in sorted(
            tfidf_top_terms(docs, 2).filter("doc_id = 1").collect(),
            key=lambda r: r["term_rank"],
        )
    ]
    assert r1 == ["rare", "common"]


def test_partitioning_invariant(spark):
    rows = [
        (i, " ".join(f"w{(i * j) % 17}" for j in range(12))) for i in range(150)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = tfidf_top_terms(docs.repartition(1), 4).collect()
    b = tfidf_top_terms(docs.repartition(8, "doc_id"), 4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_rejects_bad_k(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        tfidf_top_terms(docs, 0)
