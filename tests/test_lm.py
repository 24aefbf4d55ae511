"""Bigram-LM corpus scoring (jitsu_spark/text/lm.py)."""

from __future__ import annotations

import math
from collections import Counter

from jitsu_spark.text.lm import bigram_model, perplexity_filter, score_documents


def _py_oracle(corpus: dict):
    """Exact reference: add-one-smoothed bigram NLL in 1e-8 integer units."""
    bgs, toks = [], set()
    for t in corpus.values():
        if not t:
            continue
        w = t.split(" ")
        toks.update(w)
        bgs += list(zip(w, w[1:]))
    c2, c1, v = Counter(bgs), Counter(b[0] for b in bgs), len(toks)

    def score(text):
        if not text:
            return 0, 0
        w = text.split(" ")
        n = tot = 0
        for p in zip(w, w[1:]):
            nll = -math.log((c2.get(p, 0) + 1) / (c1.get(p[0], 0) + v))
            tot += int(round(nll * 1e8))
            n += 1
        return n, tot

    return {k: score(t) for k, t in corpus.items()}


def test_score_matches_python_oracle(spark):
    corpus = {
        1: "a b a b c",
        2: "a b",
        3: "z",
        4: None,
        5: "",
        6: "c c c",
        7: "q w e r t y q w e",
    }
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in score_documents(docs, bigram_model(docs)).collect()
    }
    exp = _py_oracle(corpus)
    assert set(out) == set(corpus)  # every input id keeps a row
    for k, (n, tot) in exp.items():
        assert out[k]["n_bigrams"] == n
        assert out[k]["sum_nll_e8"] == tot
        if n:
            assert out[k]["avg_nll"] == round(tot / (n * 1e8), 4)
        else:
            assert out[k]["avg_nll"] is None


def test_score_partitioning_invariant(spark):
    rows = [(i, " ".join(f"t{(i * j) % 13}" for j in range(20))) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    m = bigram_model(docs)
    a = score_documents(docs.repartition(1), m).collect()
    b = score_documents(docs.repartition(8, "doc_id"), m).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_unseen_context_backs_off_to_uniform(spark):
    train = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    m = bigram_model(train)  # V = 2
    probe = spark.createDataFrame([(9, "x y")], "doc_id long, text string")
    out = score_documents(probe, m).collect()[0]
    # unseen bigram, unseen context: p = (0+1)/(0+2)
    assert out["sum_nll_e8"] == int(round(-math.log(1 / 2) * 1e8))


def test_perplexity_filter_keeps_probable_docs(spark):
    # 50 fluent docs repeating the same phrase + 1 gibberish doc: the
    # gibberish doc's bigrams are all unseen -> highest avg NLL.
    rows = [(i, "the cat sat on the mat") for i in range(50)]
    rows.append((99, "zq xv jk wp mn bt"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    m = bigram_model(docs)
    scored = {r["doc_id"]: r["avg_nll"] for r in score_documents(docs, m).collect()}
    assert scored[99] == max(scored.values())
    kept = {r["doc_id"] for r in perplexity_filter(docs, m, scored[99] - 0.0001).collect()}
    assert 99 not in kept and kept == set(range(50))
    # threshold at exactly the max keeps everything (<= comparison, exact ints)
    kept_all = perplexity_filter(docs, m, scored[99]).count()
    assert kept_all == 51


def test_short_docs_dropped_by_min_bigrams(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a"), (3, "")], "doc_id long, text string"
    )
    m = bigram_model(docs)
    kept = {r["doc_id"] for r in perplexity_filter(docs, m, 100.0).collect()}
    assert kept == {1}
