"""Property-based check of the merge kernel: for ANY op sequence and ANY
batch split, replaying through the engine must equal the dict oracle —
hypothesis explores orderings/duplicates/delete-resurrection edges the
fixed fixtures don't."""

from __future__ import annotations

import os

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from jitsu_spark.changelog import dict_replay
from jitsu_spark.lake import LakeTable
from jitsu_spark.lake.merge import merge_batch
from tests.test_merge import TARGET_SCHEMA, batch


_ops = st.lists(
    st.tuples(
        st.sampled_from(["i", "u", "d"]),
        st.integers(min_value=0, max_value=4),   # doc index (collisions likely)
        st.integers(min_value=0, max_value=99),  # token payload
    ),
    min_size=1,
    max_size=24,
)
_mode = st.sampled_from(["cow", "mor"])
_splits = st.integers(min_value=1, max_value=4)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops, mode=_mode, n_batches=_splits)
def test_any_op_sequence_matches_dict_oracle(
    spark, tmp_path_factory, ops, mode, n_batches
):
    rows = [
        {
            "seq": i,
            "op": op,
            "doc_id": f"doc{d}",
            "tokens": None if op == "d" else [tok, d],
            "n_tok": None if op == "d" else 2,
            "source": "prop",
            "ts": None,
        }
        for i, (op, d, tok) in enumerate(ops)
    ]
    expected = dict_replay(rows)

    root = str(tmp_path_factory.mktemp("prop"))
    t = LakeTable.create(
        spark, os.path.join(root, "t"), TARGET_SCHEMA, "doc_id",
        n_buckets=4, properties={"write.mode": mode},
    )
    per = len(rows) // n_batches + 1
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per]
        if chunk:
            merge_batch(t, batch(spark, chunk), batch_id=b, job_id="prop")
    got = {
        r["doc_id"]: r["tokens"] for r in t.read().collect()
    }
    want = {k: v["tokens"] for k, v in expected.items()}
    assert got == want


_ivm_ops = st.lists(
    st.tuples(
        st.sampled_from(["i", "u", "d"]),
        st.integers(min_value=0, max_value=5),   # doc index
        st.integers(min_value=0, max_value=3),   # group index (moves likely)
        st.integers(min_value=0, max_value=50),  # summed payload
    ),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ivm_ops, n_batches=st.integers(min_value=1, max_value=3))
# pinned adversarial cases — the two classic IVM sign-error traps, run on
# EVERY execution regardless of what hypothesis generates:
# 1. delete-everything-in-a-group (g0 empties -> its aggregate row must
#    be DELETED, not left at 0 or gone negative)
@example(
    ops=[("i", 0, 0, 5), ("i", 1, 0, 7), ("i", 2, 1, 3),
         ("d", 0, 0, 0), ("d", 1, 0, 0)],
    n_batches=2,
)
# 2. group migration (doc 2 moves g1 -> g0 between versions: -1 on the
#    old group's count/sum, +1 on the new — both signs must land)
@example(
    ops=[("i", 0, 0, 5), ("i", 2, 1, 3), ("u", 2, 0, 9),
         ("u", 2, 2, 11), ("d", 0, 0, 0)],
    n_batches=3,
)
def test_sync_aggregate_any_op_sequence_matches_recompute(
    spark, tmp_path_factory, ops, n_batches
):
    """Property: for ANY op sequence (including group-moving updates,
    deletes, re-inserts) applied in ANY batch split with a sync after
    every batch, the incrementally-maintained aggregate equals a full
    recompute of the final upstream state."""
    from pyspark.sql import types as T

    from jitsu_spark.lake.mirror import sync_aggregate

    up_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("grp", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    agg_schema = T.StructType(
        [
            T.StructField("grp", T.StringType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("v", T.LongType()),
        ]
    )
    rows = [
        {
            "seq": i,
            "op": op,
            "doc_id": f"doc{d}",
            "grp": None if op == "d" else f"g{g}",
            "v": None if op == "d" else v,
        }
        for i, (op, d, g, v) in enumerate(ops)
    ]
    root = str(tmp_path_factory.mktemp("ivm"))
    up = LakeTable.create(
        spark, os.path.join(root, "up"), up_schema, "doc_id",
        n_buckets=4, properties={"write.mode": "mor"},
    )
    agg = LakeTable.create(
        spark, os.path.join(root, "agg"), agg_schema, "grp", n_buckets=2
    )
    env_schema = T.StructType(
        [
            T.StructField("seq", T.LongType()),
            T.StructField("op", T.StringType()),
        ]
        + list(up_schema.fields)
    )
    per = len(rows) // n_batches + 1
    for b in range(n_batches):
        part = rows[b * per: (b + 1) * per]
        if not part:
            continue
        merge_batch(
            up, spark.createDataFrame(part, env_schema), batch_id=b,
            job_id="ivm-prop",
        )
        sync_aggregate(up, agg, "grp", sum_cols=["v"], job_id="ivm-prop-agg")

    expected = {}
    for r in up.read().collect():
        n, s = expected.get(r["grp"], (0, 0))
        expected[r["grp"]] = (n + 1, s + r["v"])
    got = {r["grp"]: (r["n_rows"], r["v"]) for r in agg.read().collect()}
    assert got == expected
