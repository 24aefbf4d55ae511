"""Steady-state IVM benchmark: after a BIG corpus is already indexed,
how much does it cost to absorb a SMALL batch of changed documents into
each changes()-maintained derived view, vs recomputing that view from
the full corpus (what a batch pipeline would do every cycle)? This is
the number the whole IVM family exists for — at 100 TB the full
recompute is off the table, so BASELINE.md records the measured gap at
a corpus/delta ratio that mirrors the steady regime (default 0.5%).

Views measured:
  - corpus stats  (term df/tf + N + bigram-LM counts; sync_aggregate)
  - LSH band index (sync_derived_rows)       vs band_rows(full corpus)
  - passage-dedup  (occurrence/winner/result) vs dedup_passages(full)

Protocol matches the other bench tools: tmpfs scratch, per-number min
over n_batches steady-state syncs (distinct deltas of equal size — the
state mutates, so reps are across batches, not re-runs), full-recompute
comparators min-of-3 in the same JVM, noop-write forcing.

Usage: python tools/bench_ivm.py [docs_scale] [delta_docs] [n_batches] [cpus] [n_buckets]
       (defaults: 40 1000 3 8 64 — ~200k docs from sf0.1, 0.5% deltas;
       bucket pruning needs changed keys << n_buckets to bite, so pair a
       small delta with a high bucket count to see the production regime)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def main() -> None:
    docs_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    delta_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    n_buckets = int(sys.argv[5]) if len(sys.argv) > 5 else 64

    from jitsu_spark.dedup.lsh_index import create_lsh_index, sync_lsh_index
    from jitsu_spark.dedup.minhash import band_rows
    from jitsu_spark.lake import LakeTable
    from jitsu_spark.lake.merge import merge_batch
    from jitsu_spark.lake.mirror import WindowImages
    from jitsu_spark.session import get_spark
    from jitsu_spark.text.lm import bigram_model
    from jitsu_spark.text.passage_ivm import PassageDedupView
    from jitsu_spark.text.passages import dedup_passages
    from jitsu_spark.text.term_stats import create_corpus_stats, sync_corpus_stats
    from jitsu_spark.text.tokenize import doc_tokens

    scratch = os.environ.get("JITSU_SCALE_DIR", "/dev/shm/jitsu_scale")
    os.makedirs(scratch, exist_ok=True)
    work = tempfile.mkdtemp(prefix="jitsu_ivm_", dir=scratch)
    spark = get_spark(
        app_name="ivm-steady", cores=cpus, shuffle_partitions=cpus * 4,
        extra_conf={"spark.local.dir": os.path.join(work, "sl")},
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = os.environ.get("JITSU_TEXT_BASE", "/root/testdata/sf0.1")
    src = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    rep = spark.range(docs_scale).select(F.col("id").alias("_rep"))
    corpus = (
        src.crossJoin(rep)
        .withColumn("doc_id", F.col("doc_id") + F.col("_rep") * 10_000_000)
        .withColumn(
            "text",
            F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" r"), F.col("_rep"))
            ),
        )
        .select("doc_id", "text")
        .repartition(64)
    )
    corpus_dir = os.path.join(work, "docs")
    corpus.write.parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)
    n_docs = corpus.count()
    mod = max(n_docs // delta_docs, 1)

    up = LakeTable.create(
        spark, os.path.join(work, "up"), DOC_SCHEMA, "doc_id",
        n_buckets=n_buckets, properties={"write.mode": "mor"},
    )
    merge_batch(
        up,
        corpus.select(
            "doc_id", "text",
            F.lit(1).cast("long").alias("seq"), F.lit("u").alias("op"),
        ),
        batch_id="seed",
        job_id="up",
    )

    stats = create_corpus_stats(spark, os.path.join(work, "stats"), n_buckets=n_buckets)
    index = create_lsh_index(
        spark, os.path.join(work, "lsh"), k=8, bands=4, shingle_n=3,
        n_buckets=n_buckets,
    )
    passages = PassageDedupView.create(
        spark, os.path.join(work, "pass"), window=10, n_buckets=n_buckets,
    )
    # one WindowImages per upstream commit, shared by ALL views — the
    # composed-deployment shape: N views of one CDC table, ONE window scan
    views = {
        "corpus_stats": lambda img: sync_corpus_stats(up, stats, images=img),
        "lsh_index": lambda img: sync_lsh_index(up, index, images=img),
        "passage_dedup": lambda img: passages.sync(up, images=img),
    }

    results: dict = {
        "n_docs": n_docs, "delta_docs": delta_docs,
        "n_batches": n_batches, "cpus": cpus,
        "delta_pct": round(100.0 * delta_docs / n_docs, 3),
        "n_buckets": n_buckets,
        "compact_between_batches": os.environ.get("JITSU_IVM_COMPACT") == "1",
    }

    # bootstrap sync == the view's initial full build through the IVM path
    boot: dict[str, float] = {}
    img = WindowImages(up)
    for name, sync in views.items():
        t0 = time.monotonic()
        sync(img)
        boot[name] = round(time.monotonic() - t0, 3)
    img.release()
    results["bootstrap_s"] = boot

    # JITSU_IVM_COMPACT=1: fold every MoR delta back into base between
    # batches (UNTIMED — background/amortized work in a real deployment).
    # Without it, every view bucket stays dirty after the first sync and
    # every subsequent read pays the full LWW-reconcile shuffle — the
    # no-compaction numbers measure exactly that tax.
    compact = os.environ.get("JITSU_IVM_COMPACT") == "1"
    all_tables = [up, index, passages.occ, passages.winners,
                  passages.result] + list(stats.values())

    # JITSU_IVM_MODE=insert: deltas are BRAND-NEW docs (the append-heavy
    # training-corpus ingest regime — no retractions, so the winner-split
    # stage-2 never touches the occurrence index); default = updates.
    insert_mode = os.environ.get("JITSU_IVM_MODE") == "insert"
    # JITSU_IVM_DELTA=clustered (insert regime): every delta doc carries
    # the SAME text (a near-dup crawl burst) so their passages/bands
    # concentrate on a handful of hashes — the workload where the
    # passage/index state tables' prefix-bucket pruning actually bites
    # (dirty buckets ~ passages of ONE doc, not delta_docs x fanout).
    # Hash-spread deltas dirty ~every bucket at any sandbox-feasible
    # bucket count because fanout x delta >> n_buckets.
    clustered = os.environ.get("JITSU_IVM_DELTA") == "clustered"
    results["delta_mode"] = (
        ("insert" if insert_mode else "update")
        + ("+clustered" if clustered else "")
    )
    base_text = None
    if clustered:
        if not insert_mode:
            raise SystemExit("JITSU_IVM_DELTA=clustered requires insert mode")
        base_text = corpus.orderBy("doc_id").limit(1).collect()[0]["text"]

    # steady state: n_batches distinct same-size deltas, timed per view
    inc: dict[str, list[float]] = {name: [] for name in views}
    for i in range(n_batches):
        if compact:
            for t in all_tables:
                t.compact(max_files_per_bucket=1)
        delta = corpus.filter(F.col("doc_id") % mod == i).select(
            (
                # shift far past the replica id space (replicas occupy
                # doc_id + rep*10M, rep < scale) so inserts NEVER collide
                # with an existing doc — a collision would silently turn
                # the insert-only regime into updates of unrelated docs
                F.col("doc_id") + F.lit(10_000_000_000 * (i + 1))
                if insert_mode
                else F.col("doc_id")
            ).alias("doc_id"),
            (
                # identical text per batch: passages concentrate; the
                # " c<i>" suffix keeps batches distinct from each other
                F.concat(F.lit(base_text), F.lit(" c"), F.lit(i))
                if clustered
                else F.concat(F.col("text"), F.lit(" u"), F.lit(i))
            ).alias("text"),
            F.lit(i + 2).cast("long").alias("seq"),
            F.lit("u").alias("op"),
        )
        merge_batch(up, delta, batch_id=f"d{i}", job_id="up")
        img = WindowImages(up)
        for name, sync in views.items():
            t0 = time.monotonic()
            sync(img)
            inc[name].append(round(time.monotonic() - t0, 3))
        img.release()

    # full-recompute comparators over the upstream's CURRENT state (what
    # a batch pipeline re-runs every cycle), min-of-3 in the same JVM
    cur = up.read().select("doc_id", "text")
    cur.write.parquet(os.path.join(work, "cur"))  # flat scan, like the views read
    cur = spark.read.parquet(os.path.join(work, "cur"))

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    def stats_full():
        tok = doc_tokens(cur, "doc_id", "text")
        tf = tok.groupBy("doc_id", "token").count()
        _noop(tf.groupBy("token").agg(F.count("*"), F.sum("count")))
        _noop(cur.select(F.count("*")))
        c2, _c1, _v = bigram_model(cur)
        _noop(c2)

    full_fns = {
        "corpus_stats": stats_full,
        "lsh_index": lambda: _noop(
            band_rows(cur, "doc_id", "text", k=8, bands=4, shingle_n=3)
        ),
        "passage_dedup": lambda: _noop(dedup_passages(cur, window=10)),
    }
    full: dict[str, float] = {}
    for name, fn in full_fns.items():
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            fn()
            el = time.monotonic() - t0
            best = el if best is None else min(best, el)
        full[name] = round(best, 3)

    results["full_recompute_s"] = full
    results["incremental_s"] = {k: min(v) for k, v in inc.items()}
    results["incremental_all_s"] = inc
    results["pipeline_total_s"] = [
        round(sum(inc[n][i] for n in views), 3) for i in range(n_batches)
    ]
    results["speedup"] = {
        k: round(full[k] / min(v), 2) for k, v in inc.items()
    }
    print(json.dumps(results))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
