"""PII scrub, repetition signals, passage dedup, top-k selection
(jitsu_spark/text/{pii,repetition,passages,corpus}.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from jitsu_spark.text.corpus import select_top_k
from jitsu_spark.text.passages import dedup_passages, explode_passages
from jitsu_spark.text.pii import scrub_pii
from jitsu_spark.text.repetition import repetition_signals


def test_pii_scrub_families_and_order(spark):
    rows = [
        (1, "mail me at bob.smith+x@sub.example.co.uk today"),
        (2, "server 10.0.255.3 answered"),
        (3, "call 555-123-4567 now"),
        (4, "card 4111111111111111 expired"),
        (5, "no pii here at all"),
        # phone digits must NOT also count as a card (scrub order), and
        # an IP inside an email must not fire after the email is gone
        (6, "x 555-123-4567 y 1.2.3.4 z a@b.io w 12345678901234"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert out[1]["n_email"] == 1 and "<EMAIL>" in out[1]["clean_text"]
    assert "bob" not in out[1]["clean_text"]
    assert out[2]["n_ip"] == 1 and out[2]["clean_text"] == "server <IP> answered"
    assert out[3]["n_phone"] == 1 and out[3]["clean_text"] == "call <PHONE> now"
    assert out[4]["n_card"] == 1 and out[4]["clean_text"] == "card <CARD> expired"
    assert out[5]["pii_total"] == 0 and out[5]["clean_text"] == out[5]["text"]
    r6 = out[6]
    assert (r6["n_email"], r6["n_ip"], r6["n_phone"], r6["n_card"]) == (1, 1, 1, 1)
    assert r6["clean_text"] == "x <PHONE> y <IP> z <EMAIL> w <CARD>"
    assert r6["pii_total"] == 4


def test_repetition_signals_exact_fracs(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y z"), (3, "q")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    r1 = out[1]
    assert (r1["n_words"], r1["n_distinct_words"]) == (4, 2)
    assert r1["dup_word_frac"] == 0.5
    assert r1["top_word_frac"] == 0.75
    # bigrams: "a a" x2, "a b" -> 2/3
    assert r1["top_bigram_frac"] == round(2 / 3, 6)
    r2 = out[2]
    assert r2["dup_word_frac"] == 0.0 and r2["top_word_frac"] == round(1 / 3, 6)
    r3 = out[3]
    assert (r3["n_words"], r3["top_bigram_frac"]) == (1, 0.0)


def test_passage_dedup_first_occurrence_wins(spark):
    shared = " ".join(f"s{i}" for i in range(10))
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(7))  # short tail chunk
    df = spark.createDataFrame(
        [
            (1, shared + " " + uniq_a),
            (2, shared + " " + uniq_b),  # shared passage removed here
            (3, "tiny doc"),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in dedup_passages(df, window=10).collect()}
    assert out[1]["n_passages"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["clean_text"] == shared + " " + uniq_a
    assert out[2]["n_passages"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == uniq_b
    assert out[3]["n_kept"] == 1 and out[3]["clean_text"] == "tiny doc"
    # passage explode shape: pos is dense per doc
    p = explode_passages(df, window=10)
    assert p.filter((F.col("doc_id") == 1) & (F.col("pos") == 1)).count() == 1


def test_passage_dedup_within_doc_repeat(spark):
    block = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, block + " " + block)], "doc_id int, text string"
    )
    out = dedup_passages(df, window=10).collect()[0]
    # second occurrence inside the SAME doc is also deduped
    assert out["n_passages"] == 2 and out["n_kept"] == 1
    assert out["clean_text"] == block


def test_select_top_k_deterministic_and_take_ordered(spark):
    rows = [(i, " ".join(["abcdef"] * (5 + i % 3))) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = select_top_k(df, 7)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global sort at scale
    got = top.collect()
    assert len(got) == 7
    # all same mean word len -> ordered by n_words desc then doc_id asc
    assert [r["doc_id"] for r in got] == [2, 5, 8, 11, 14, 17, 20]


def test_passage_dedup_global_uniqueness_property(spark):
    """Property (hypothesis-style over a seeded random corpus): after
    dedup, every distinct passage of the corpus survives EXACTLY once
    globally, and per-doc counts reconcile."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for d in range(60):
        n = rng.randint(1, 40)
        docs.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = dedup_passages(df, window=5).cache()
    from jitsu_spark.text.passages import explode_passages

    p = explode_passages(df, window=5)
    n_distinct = p.select("passage").distinct().count()
    total_kept = out.agg(F.sum("n_kept")).first()[0]
    assert total_kept == n_distinct
    total = out.agg(F.sum("n_passages")).first()[0]
    assert total == p.count()
    out.unpersist()


def test_pii_scrub_null_text_counts_zero(spark):
    """NULL text (a CDC delete envelope) must produce 0 counts, not NULL."""
    df = spark.createDataFrame([(1, None)], "doc_id int, text string")
    r = scrub_pii(df).collect()[0]
    assert (r["n_email"], r["n_ip"], r["n_phone"], r["n_card"]) == (0, 0, 0, 0)
    assert r["pii_total"] == 0 and r["clean_text"] is None


def test_null_text_docs_do_not_vanish(spark):
    """Per-doc operators must emit a row for every input id, even with
    NULL text (treated as the empty document)."""
    df = spark.createDataFrame(
        [(1, None), (2, "a b c d e")], "doc_id int, text string"
    )
    rep = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert set(rep) == {1, 2} and rep[1]["n_words"] == 1
    ded = {r["doc_id"]: r for r in dedup_passages(df, window=3).collect()}
    assert set(ded) == {1, 2} and ded[1]["clean_text"] == ""
    from jitsu_spark.text.vocab import build_vocab, encode_documents

    enc = {
        r["doc_id"]: r
        for r in encode_documents(df, build_vocab(df, 4)).collect()
    }
    assert set(enc) == {1, 2} and enc[1]["n_tokens"] == 1
