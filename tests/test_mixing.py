"""Domain-mixture sampling (jitsu_spark/text/mixing.py).

Reference parity: the reference has no mixture sampler (it is an ingest
engine); this is part of the training-data-pipeline surface the graft
adds. Semantics follow published mixture-table recipes (Pile/LLaMA):
expected multiplicity per doc == domain weight, realized deterministically
from an md5 uniform so reruns and repartitions agree bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from jitsu_spark.text.mixing import expected_multiplicity, mixture_stats, sample_mixture


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(f"d{i}", ["a", "b", "c", "d"][i % 4]) for i in range(400)]
    return spark.createDataFrame(rows, "doc_id string, source string").cache()


def test_weight_zero_drops_domain(spark, docs):
    out = sample_mixture(docs, {"a": 0.0}, seed=1)
    assert out.filter(F.col("source") == "a").count() == 0
    # other domains untouched at default weight 1.0: exactly one copy each
    kept = out.filter(F.col("source") != "a")
    assert kept.count() == 300
    assert kept.agg(F.max("copy_no")).first()[0] == 0


def test_upsample_copy_counts_and_copy_no(spark, docs):
    out = sample_mixture(docs, {"b": 3.0, "c": 2.5}, seed=2)
    b = out.filter(F.col("source") == "b").groupBy("doc_id").count()
    # integer weight: exactly floor(w) copies for every doc
    assert b.filter(F.col("count") != 3).count() == 0
    c = out.filter(F.col("source") == "c").groupBy("doc_id").count()
    assert c.filter(~F.col("count").isin(2, 3)).count() == 0
    # realized mean multiplicity near 2.5 (md5 uniform, 100 docs)
    mean = c.agg(F.avg("count")).first()[0]
    assert 2.2 <= mean <= 2.8
    # copy_no is dense 0..n-1 per doc
    dense = (
        out.filter(F.col("source") == "c")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.max("copy_no").alias("mx"), F.min("copy_no").alias("mn"))
    )
    assert dense.filter((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0)).count() == 0


def test_downsample_fraction(spark, docs):
    out = sample_mixture(docs, {"d": 0.4}, seed=3)
    n = out.filter(F.col("source") == "d").count()
    assert 25 <= n <= 55  # 100 docs * 0.4 expected, md5-uniform spread


def test_deterministic_across_partitioning(spark, docs):
    a = sample_mixture(docs.repartition(1), {"a": 0.3, "b": 2.2}, seed=9)
    b = sample_mixture(docs.repartition(7, "source"), {"a": 0.3, "b": 2.2}, seed=9)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_mixture_stats_fracs_sum_to_one(spark, docs):
    out = sample_mixture(docs, {"a": 0.5, "b": 2.0}, seed=4)
    stats = mixture_stats(out).collect()
    assert abs(sum(r["frac"] for r in stats) - 1.0) < 1e-9
    by = {r["source"]: r["n_rows"] for r in stats}
    assert by["b"] == 200  # integer weight exact


def test_negative_weight_rejected(spark, docs):
    with pytest.raises(ValueError):
        sample_mixture(docs, {"a": -0.1})


def test_expected_multiplicity_helper():
    assert expected_multiplicity(2.5) == (2, 0.5)
    assert expected_multiplicity(0.4) == (0, 0.4)


def test_mixture_split_shard_streams_independent(spark, docs):
    """Same seed across mixture / split / shard must NOT correlate: the
    salted hash streams are distinct, so a down-sampled domain still
    lands in every split and every shard."""
    from jitsu_spark.text.shard import shard_corpus
    from jitsu_spark.text.split import split_corpus

    mixed = sample_mixture(docs, {"a": 0.4}, seed=3)
    kept_a = mixed.filter(F.col("source") == "a")
    sp = split_corpus(kept_a, {"train": 0.6, "val": 0.2, "test": 0.2}, seed=3)
    splits = {r["split"] for r in sp.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}  # unsalted streams -> train-only
    sh = shard_corpus(kept_a, 4, seed=3)
    assert sh.select("shard").distinct().count() == 4


def test_internal_column_collision_rejected(spark):
    from jitsu_spark.text.shard import shard_corpus

    df = spark.createDataFrame([(1, 0)], "doc_id long, _n_copies int")
    with pytest.raises(ValueError):
        sample_mixture(df, {"x": 2.0})
    df2 = spark.createDataFrame([(1, "z")], "doc_id long, _oh string")
    with pytest.raises(ValueError):
        shard_corpus(df2, 2)
