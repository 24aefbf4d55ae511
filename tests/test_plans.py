"""Physical-plan assertions: the optimizations the engine's scale story
depends on must actually appear in the executed plans — predicate pushdown
to the parquet scan, column pruning, map-side partial aggregation for the
LWW reduce, broadcast joins for dimension lookups, and whole-stage codegen
over the transform surface."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from jitsu_spark.changelog import changelog_df
from jitsu_spark.operators import flatten, with_context_enrichment


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("plans") / "log")
    changelog_df(spark, 20000, 2000, seed=2).write.parquet(d)
    return d


def test_seq_filter_pushed_to_scan(spark, log_dir):
    """Per-batch seq-range filters must reach the parquet reader so row
    groups outside the range are skipped (the log is seq-ordered)."""
    df = spark.read.parquet(log_dir).filter(
        (F.col("seq") >= 5000) & (F.col("seq") < 10000)
    )
    plan = plan_of(df)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(seq,5000)" in plan
    assert "LessThan(seq,10000)" in plan


def test_column_pruning_in_stats_pass(spark, log_dir):
    """The merge kernel's stats pass must not read the tokens payload."""
    df = spark.read.parquet(log_dir)
    stats = df.groupBy(
        F.pmod(F.xxhash64("doc_id"), F.lit(8)).alias("b")
    ).agg(F.count(F.lit(1)), F.min("seq"), F.max("seq"))
    plan = plan_of(stats)
    # ReadSchema should carry only the referenced columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "tokens" not in read_schema[0]
    assert "doc_id" in read_schema[0] and "seq" in read_schema[0]


def test_lww_reduce_is_partial_aggregate(spark, log_dir):
    """The LWW reduce must be a two-phase aggregate with a MAP-SIDE partial
    combine (partial_max_by before the exchange — the skew-defusing
    property), never a window: a window would shuffle every duplicate of a
    hot key to one reducer. Spark picks SortAggregate for struct-valued
    max_by; that's fine — the partial phase is what matters."""
    df = spark.read.parquet(log_dir)
    lww = df.groupBy("doc_id").agg(
        F.max_by(F.struct("tokens", "op"), F.col("seq")).alias("w")
    )
    plan = plan_of(lww)
    # the partial phase is placed before the exchange by construction;
    # its presence is the map-side combine
    assert "partial_max_by" in plan
    assert "Window" not in plan
    tree = plan.split("\n\n")[0]  # the operator tree (details repeat names)
    assert tree.count("Exchange") == 1  # exactly one shuffle


def test_dimension_join_broadcasts(spark):
    """Small dimension lookups (identities, geo-style enrichments) must be
    broadcast — never shuffle the fact side."""
    fact = changelog_df(spark, 5000, 500, seed=3)
    dim = spark.createDataFrame(
        [(f"src{i}", f"name{i}") for i in range(5)], ["source", "src_name"]
    )
    joined = fact.join(F.broadcast(dim), "source", "left")
    plan = plan_of(joined)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_transform_surface_stays_in_codegen(spark):
    """Flatten + enrichment compile to narrow projections inside one
    whole-stage-codegen span — no Python, no shuffle."""
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [(("1",), 5, None)],
        T.StructType(
            [
                T.StructField(
                    "eventn_ctx",
                    T.StructType([T.StructField("event_id", T.StringType())]),
                ),
                T.StructField("key2", T.IntegerType()),
                T.StructField("src", T.StringType()),
            ]
        ),
    )
    out = with_context_enrichment(flatten(df), api_key="t", src="js")
    plan = plan_of(out)
    assert "codegen id" in plan  # inside a whole-stage-codegen span
    assert "Exchange" not in plan  # narrow: zero shuffles
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cow_read_has_no_reconcile_aggregate(spark, tmpdir_path):
    """CoW tables must keep the plain-scan read path (the MoR reconcile
    aggregate only appears when delta files exist)."""
    from jitsu_spark.lake import LakeTable
    from jitsu_spark.lake.merge import merge_batch
    from tests.test_merge import TARGET_SCHEMA, batch, ev

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TARGET_SCHEMA, "doc_id", n_buckets=4
    )
    merge_batch(t, batch(spark, [ev(1, "i", "a", [1])]), batch_id=0)
    plan = plan_of(t.read())
    assert "Aggregate" not in plan


def test_mor_read_delta_aware_bucket_pruning(spark, tmpdir_path):
    """Only delta-bearing buckets go through the reconcile aggregate; clean
    buckets union in as plain scans. At 100 TB with one hot delta'd bucket
    the read shuffles that bucket, not the table."""
    from jitsu_spark.lake import LakeTable
    from jitsu_spark.lake.merge import merge_batch
    from tests.test_merge import TARGET_SCHEMA, batch, ev

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TARGET_SCHEMA, "doc_id",
        n_buckets=4, properties={"write.mode": "mor"},
    )
    # seed every bucket with base data, fold deltas to base
    merge_batch(
        t, batch(spark, [ev(i, "i", f"doc{i}", [i]) for i in range(40)]), batch_id=0
    )
    t.compact(max_files_per_bucket=0)
    snap = t.snapshot()
    assert all(
        e.get("kind", "base") == "base" for es in snap.files.values() for e in es
    )
    # dirty exactly one bucket with a single-key update
    merge_batch(t, batch(spark, [ev(100, "u", "doc0", [99])]), batch_id=1)
    dirty = [
        b for b, es in t.snapshot().files.items()
        if any(e.get("kind", "base") == "delta" for e in es)
    ]
    assert len(dirty) == 1
    df = t.read()
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]
    assert "Union" in tree
    # a clean-bucket plain scan sits ABOVE the reconcile aggregate in the
    # union (pre-fix, the aggregate topped the plan and consumed every scan)
    first_scan = tree.find("Scan parquet")
    agg_positions = [
        p for p in (tree.find("HashAggregate"), tree.find("SortAggregate"))
        if p >= 0
    ]
    assert agg_positions, tree
    assert 0 <= first_scan < min(agg_positions), tree
    rows = {r["doc_id"]: r["tokens"] for r in df.collect()}
    assert len(rows) == 40 and rows["doc0"] == [99]


def test_mor_read_reconciles_and_prunes(spark, tmpdir_path):
    from jitsu_spark.lake import LakeTable
    from jitsu_spark.lake.merge import merge_batch
    from tests.test_merge import TARGET_SCHEMA, batch, ev

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TARGET_SCHEMA, "doc_id",
        n_buckets=4, properties={"write.mode": "mor"},
    )
    merge_batch(t, batch(spark, [ev(1, "i", "a", [1])]), batch_id=0)
    merge_batch(t, batch(spark, [ev(2, "u", "a", [2])]), batch_id=1)
    plan = plan_of(t.read())
    assert "Aggregate" in plan  # reconcile present
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["tokens"] == [2]


def test_geo_lookup_broadcasts_and_ua_parse_stays_codegen(spark):
    """The geo dim must broadcast (fact side never shuffles) and the UA
    parse must compile to pure expressions — no Python eval, no shuffle."""
    from jitsu_spark.operators import with_geo_lookup, with_parsed_ua

    fact = changelog_df(spark, 5000, 500, seed=4).withColumn(
        "source_ip", F.lit("10.1.2.3")
    ).withColumn("user_agent", F.lit("curl/8.4.0"))
    dim = spark.createDataFrame(
        [(167772160, 167837695, "US", "nyc")],
        ["net_start", "net_end", "country", "city"],
    )
    geo = with_geo_lookup(fact, dim)
    plan = plan_of(geo)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "Exchange hashpartitioning" not in plan

    ua = with_parsed_ua(fact)
    uplan = plan_of(ua)
    assert "codegen id" in uplan
    assert "Exchange" not in uplan
    assert "BatchEvalPython" not in uplan and "ArrowEvalPython" not in uplan


def test_token_multiplex_broadcasts_dim_never_shuffles_events(spark):
    """F4 fan-out must be a broadcast join of the tiny (token, destination)
    dim — the event stream side must not hash-shuffle."""
    from pyspark.sql import functions as F

    from jitsu_spark.streaming.multiroute import multiplex_by_token

    events = spark.range(10_000).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("tok"), (F.col("id") % 3).cast("string")).alias("api_key"),
    )
    routed = multiplex_by_token(
        events, {"tok0": ["d_a"], "tok1": ["d_a", "d_b"]}
    )
    plan = plan_of(routed)
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree, tree
    assert "SortMergeJoin" not in tree, tree
    assert "Exchange hashpartitioning" not in tree, tree


def test_rebucket_rewrite_plan_has_no_shuffle(spark, tmpdir_path):
    """The resize rewrite must be a narrow per-task split: modulo-doubling
    sends old bucket b's rows only to {b, b+n, ...}, so the plan carries
    no Exchange (a global repartition at 100 TB would be the bottleneck)."""
    from pyspark.sql import functions as F

    from jitsu_spark.lake import LakeTable
    from jitsu_spark.lake.merge import merge_batch
    from jitsu_spark.lake.table import BUCKET_COL
    from tests.test_merge import TARGET_SCHEMA, batch, ev

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TARGET_SCHEMA, "doc_id",
        n_buckets=4,
    )
    merge_batch(
        t, batch(spark, [ev(i, "i", f"doc{i}", [i]) for i in range(20)]),
        batch_id=0,
    )
    snap = t.snapshot()
    df = t.read(snap=snap).withColumn(
        BUCKET_COL,
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(snap.n_buckets * 2)).cast("int"),
    )
    plan = plan_of(df).split("\n\n")[0]
    assert "Exchange" not in plan, plan


def test_repetition_signals_two_exchanges_partial_agg(spark):
    """The repetition pipeline is exactly two shuffles — (doc, token)
    counts then per-doc re-aggregate — and the first aggregate must
    partial-combine map-side (hot tokens collapse before the exchange)."""
    from jitsu_spark.text.repetition import repetition_signals

    df = spark.createDataFrame(
        [(i, "a b c a b a") for i in range(10)], "doc_id long, text string"
    )
    import re

    plan = plan_of(repetition_signals(df))
    # formatted plans list each node once in the tree and once in the
    # detail section — count the detail headers
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 2
    assert "partial_count" in plan  # map-side combine before shuffle 1


def test_vocab_encode_map_path_is_narrow(spark):
    """The default (bounded-V) encode is a map-literal narrow projection:
    zero exchanges, no join, no Python — the shuffle-free plan that fixed
    the 0.59 scaling efficiency of the join path."""
    from jitsu_spark.text.vocab import build_vocab, encode_documents

    df = spark.createDataFrame(
        [(i, "a b c d e") for i in range(10)], "doc_id long, text string"
    )
    vocab = build_vocab(df, 4)
    plan = plan_of(encode_documents(df, vocab))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_encode_join_path_broadcasts(spark):
    """The large-V fallback joins the exploded token stream against the
    vocab: must be a broadcast hash join, never sort-merge."""
    from jitsu_spark.text.vocab import build_vocab, encode_documents

    df = spark.createDataFrame(
        [(i, "a b c d e") for i in range(10)], "doc_id long, text string"
    )
    vocab = build_vocab(df, 4)
    plan = plan_of(encode_documents(df, vocab, strategy="join"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_vocab_encode_udf_path_is_narrow_arrow(spark):
    """The large-V default (broadcast-dict Arrow UDF) keeps the map
    path's narrow shape at any V: zero exchanges, no join, exactly an
    Arrow-vectorized eval — never the join path's doc_id reassembly
    shuffle."""
    from jitsu_spark.text.vocab import build_vocab, encode_documents

    df = spark.createDataFrame(
        [(i, "a b c d e") for i in range(10)], "doc_id long, text string"
    )
    vocab = build_vocab(df, 4)
    plan = plan_of(encode_documents(df, vocab, strategy="udf"))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan  # never row-at-a-time Python


def test_pii_scrub_is_shuffle_free_codegen(spark):
    """The scrub is a narrow projection: zero exchanges, whole regex fold
    inside one WholeStageCodegen span, no Python in the data path."""
    from jitsu_spark.text.pii import scrub_pii

    df = spark.createDataFrame(
        [(1, "a@b.co 1.2.3.4")], "doc_id long, text string"
    )
    plan = plan_of(scrub_pii(df))
    assert "Exchange" not in plan
    assert "codegen id" in plan  # whole-stage codegen spans the fold
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quality_topk_take_ordered_not_global_sort(spark):
    """Corpus head selection compiles to TakeOrderedAndProject — a
    global Sort here would serialize the corpus into one partition."""
    from jitsu_spark.text.corpus import select_top_k

    df = spark.createDataFrame(
        [(i, "aa bb cc") for i in range(50)], "doc_id long, text string"
    )
    plan = plan_of(select_top_k(df, 5))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")


def test_passage_dedup_no_window_partial_min(spark):
    """First-occurrence selection must be the partial-combinable
    min(struct) aggregate, never a row_number window (a boilerplate
    passage shared by 10^7 docs would serialize into one reducer)."""
    from jitsu_spark.text.passages import dedup_passages

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l")], "doc_id long, text string"
    )
    plan = plan_of(dedup_passages(df, window=10))
    assert "Window" not in plan
    assert "partial_min" in plan


def test_cluster_assignment_partial_min_by_no_window(spark):
    """Coarse-quantizer cell assignment must be the partial-combining
    min_by(struct) aggregate over a broadcast of the fixed-size centroid
    set — never a row_number window over the N*C sim pairs (that shape
    shuffled and sorted N*C rows; at centroids=N/25 it was the measured
    O(N^2) scale-killer of BENCH_r05 cluster_balanced_10x = 262 s)."""
    from jitsu_spark.similarity.curation import assign_clusters

    df = spark.createDataFrame(
        [(i, [float(i), 1.0, 2.0]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    plan = plan_of(assign_clusters(df, "vec_id", n_centroids=4))
    assert "Window" not in plan
    assert "partial_min_by" in plan
    assert "BroadcastNestedLoopJoin" in plan
