"""CDC merge kernel tests: upsert semantics, exactly-once, schema evolution,
oracle replay. Mirrors the reference's canonical integration coverage
(PK dedup N->1, no-PK N->N, retrospective updates) per SURVEY.md §5."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jitsu_spark.changelog import (
    CHANGELOG_SCHEMA,
    assert_matches_oracle,
    changelog_df,
    dict_replay,
    evolving_phases,
)
from jitsu_spark.lake import LakeTable
from jitsu_spark.lake.merge import append_batch, merge_batch

TARGET_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def make_table(spark, root, n_buckets=8) -> LakeTable:
    return LakeTable.create(
        spark, os.path.join(root, "tbl"), TARGET_SCHEMA, "doc_id", n_buckets=n_buckets
    )


def ev(seq, op, doc_id, tokens=None, source="s", ts=None):
    import datetime as dt

    return {
        "seq": seq,
        "op": op,
        "doc_id": doc_id,
        "tokens": tokens,
        "n_tok": len(tokens) if tokens is not None else None,
        "source": source,
        "ts": ts or dt.datetime(2024, 1, 1),
    }


def batch(spark, rows):
    return spark.createDataFrame(rows, CHANGELOG_SCHEMA)


def test_basic_upsert_and_delete(spark, tmpdir_path):
    t = make_table(spark, tmpdir_path)
    b1 = batch(
        spark,
        [
            ev(1, "i", "a", [1, 2, 3]),
            ev(2, "i", "b", [4]),
            ev(3, "u", "a", [9, 9]),
            ev(4, "d", "b"),
            ev(5, "i", "c", [7, 7, 7]),
        ],
    )
    res = merge_batch(t, b1, batch_id=0)
    assert not res.skipped and res.version == 1
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert set(rows) == {"a", "c"}
    assert rows["a"]["tokens"] == [9, 9] and rows["a"]["n_tok"] == 2
    assert rows["c"]["tokens"] == [7, 7, 7]


def test_pk_dedup_five_identical_inserts_one_row(spark, tmpdir_path):
    """Reference: postgres_primary_keys_test.go — with PK, 5 sends -> 1 row."""
    t = make_table(spark, tmpdir_path)
    rows = [ev(s, "i", "dup", [1, 2]) for s in range(5)]
    merge_batch(t, batch(spark, rows), batch_id=0)
    assert t.read().count() == 1


def test_no_pk_append_keeps_duplicates(spark, tmpdir_path):
    """Reference: without PK the same 5 sends land as 5 rows."""
    t = make_table(spark, tmpdir_path)
    rows = [ev(s, "i", "dup", [1, 2]) for s in range(5)]
    append_batch(t, batch(spark, rows).drop("op"), batch_id=0)
    assert t.read().count() == 5


def test_lww_out_of_order_within_batch(spark, tmpdir_path):
    """Higher seq wins regardless of arrival/row order; a stale insert after
    a delete (by seq) cannot resurrect the key."""
    t = make_table(spark, tmpdir_path)
    b = batch(
        spark,
        [
            ev(10, "u", "a", [1]),  # winner
            ev(9, "u", "a", [2]),
            ev(2, "i", "a", [3]),
            ev(20, "d", "b"),
            ev(15, "i", "b", [5]),  # stale: delete at 20 wins
        ],
    )
    merge_batch(t, b, batch_id=0)
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert set(rows) == {"a"}
    assert rows["a"]["tokens"] == [1]


def test_delete_then_reinsert_across_batches(spark, tmpdir_path):
    t = make_table(spark, tmpdir_path)
    merge_batch(t, batch(spark, [ev(1, "i", "a", [1])]), batch_id=0)
    merge_batch(t, batch(spark, [ev(2, "d", "a")]), batch_id=1)
    assert t.read().count() == 0
    merge_batch(t, batch(spark, [ev(3, "i", "a", [2])]), batch_id=2)
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["tokens"] == [2]


def test_duplicate_batch_id_skipped(spark, tmpdir_path):
    """foreachBatch replay of an already-committed batch is a no-op."""
    t = make_table(spark, tmpdir_path)
    b = batch(spark, [ev(1, "i", "a", [1])])
    r1 = merge_batch(t, b, batch_id=7)
    # replay same batch id with DIFFERENT (corrupted) content — must skip
    b2 = batch(spark, [ev(99, "u", "a", [9, 9, 9])])
    r2 = merge_batch(t, b2, batch_id=7)
    assert r2.skipped and r2.version == r1.version
    assert t.read().collect()[0]["tokens"] == [1]


def test_duplicate_seq_delivery_idempotent(spark, tmpdir_path):
    t = make_table(spark, tmpdir_path)
    rows = [ev(1, "i", "a", [1, 2]), ev(1, "i", "a", [1, 2])]
    merge_batch(t, batch(spark, rows), batch_id=0)
    out = t.read().collect()
    assert len(out) == 1 and out[0]["tokens"] == [1, 2]


def test_update_creates_missing_key(spark, tmpdir_path):
    """CDC 'u' for an unseen key upserts (retroactive-update semantics)."""
    t = make_table(spark, tmpdir_path)
    merge_batch(t, batch(spark, [ev(1, "u", "ghost", [1])]), batch_id=0)
    assert t.read().count() == 1


def test_oracle_replay_multi_batch(spark, tmpdir_path):
    """Replay a generated log in 10 micro-batches; final state must equal
    the single-threaded dict oracle (token-array equality)."""
    t = make_table(spark, tmpdir_path, n_buckets=8)
    log = changelog_df(
        spark, n_events=4000, n_docs=300, seed=7, hot_key_pct=0.2, dup_pct=0.05
    )
    rows = [r.asDict(recursive=True) for r in log.collect()]
    expected = dict_replay(rows)
    # batches must be applied in seq-monotone order for cross-batch LWW,
    # so split the log into contiguous seq ranges (as the stream would).
    n_batches = 10
    per = 4000 // n_batches
    for i in range(n_batches):
        part = log.filter(
            (F.col("seq") >= i * per) & (F.col("seq") < (i + 1) * per)
        )
        merge_batch(t, part, batch_id=i)
    assert_matches_oracle(t.read(), expected)


def test_schema_evolution_add_and_widen(spark, tmpdir_path):
    """Mid-stream ADD COLUMN (lang, quality) then widen quality int->double
    and add string published_at; old rows read as NULL / widened."""
    t = make_table(spark, tmpdir_path)
    phases = evolving_phases(spark, n_events=900, n_docs=80, seed=3)
    all_rows = []
    for i, p in enumerate(phases):
        merge_batch(t, p, batch_id=i)
        all_rows += [r.asDict(recursive=True) for r in p.collect()]
    expected = dict_replay(all_rows)
    # normalize oracle rows to the evolved schema (missing cols -> None,
    # quality widened to float)
    for v in expected.values():
        v.setdefault("lang", None)
        v.setdefault("quality", None)
        v.setdefault("published_at", None)
        if v["quality"] is not None:
            v["quality"] = float(v["quality"])
    schema = t.schema()
    assert schema["quality"].dataType.simpleString() == "double"
    assert "lang" in schema.fieldNames()
    assert "published_at" in schema.fieldNames()
    assert_matches_oracle(t.read(), expected)
    # lineage recorded the evolution
    kinds = [l for l in t.history() if l.get("schema_added") or l.get("schema_widened")]
    assert kinds, "schema changes must appear in lineage"


def test_type_widening_to_string(spark, tmpdir_path):
    """FLOAT64 ⊔ STRING = STRING (LCA) applied to live data."""
    t = make_table(spark, tmpdir_path)
    b1 = batch(spark, [ev(1, "i", "a", [1])]).withColumn("quality", F.lit(1.5))
    merge_batch(t, b1, batch_id=0)
    b2 = batch(spark, [ev(2, "i", "b", [2])]).withColumn("quality", F.lit("high"))
    merge_batch(t, b2, batch_id=1)
    assert t.schema()["quality"].dataType.simpleString() == "string"
    rows = {r["doc_id"]: r["quality"] for r in t.read().collect()}
    assert rows == {"a": "1.5", "b": "high"}


def test_merge_key_type_change_rejected(spark, tmpdir_path):
    t = make_table(spark, tmpdir_path)
    b = batch(spark, [ev(1, "i", "a", [1])]).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    bad = b.withColumn("doc_id", F.lit(123))
    with pytest.raises(TypeError):
        merge_batch(t, bad, batch_id=0)


def test_compaction_preserves_state(spark, tmpdir_path):
    # merges rewrite buckets to one file each, so fragment via the
    # append-only fast path (which only ever adds files)
    t = make_table(spark, tmpdir_path, n_buckets=2)
    for i in range(6):
        append_batch(
            t, batch(spark, [ev(i, "i", f"k{i}", [i])]).drop("op"), batch_id=i
        )
    before = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    res = t.compact(max_files_per_bucket=2)
    assert not res.skipped
    after = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    assert before == after
    snap = t.snapshot()
    assert all(len(es) <= 2 for es in snap.files.values())


def test_time_travel_snapshot_read(spark, tmpdir_path):
    t = make_table(spark, tmpdir_path)
    merge_batch(t, batch(spark, [ev(1, "i", "a", [1])]), batch_id=0)
    v1 = t.snapshot().version
    merge_batch(t, batch(spark, [ev(2, "u", "a", [2])]), batch_id=1)
    assert t.read(version=v1).collect()[0]["tokens"] == [1]
    assert t.read().collect()[0]["tokens"] == [2]


def test_merge_rejects_schema_wider_than_max_columns(spark, tmpdir_path):
    """The guard rides the table property through the merge path."""
    import pytest

    from jitsu_spark.typesys.evolution import SchemaTooWideError

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), TARGET_SCHEMA, "doc_id",
        n_buckets=4, properties={"schema.max_columns": 6},
    )
    merge_batch(t, batch(spark, [ev(1, "i", "a", [1])]), batch_id=0)
    wide = batch(spark, [ev(2, "u", "a", [2])]).withColumn(
        "extra1", F.lit(1)
    ).withColumn("extra2", F.lit(2))
    with pytest.raises(SchemaTooWideError):
        merge_batch(t, wide, batch_id=1)
    # table unchanged: the rejected batch must not half-commit
    assert t.snapshot().version == 1
    assert len(t.schema().fields) == 5


def test_concurrent_writers_optimistic_concurrency(spark, tmpdir_path):
    """D6 under REAL concurrency: four threads merge distinct batches into
    the same table simultaneously; version claims conflict, losers retry,
    and every batch lands exactly once with no lost updates."""
    from concurrent.futures import ThreadPoolExecutor

    t = make_table(spark, tmpdir_path, n_buckets=4)
    batches = {
        b: [ev(b * 100 + i, "i", f"doc{b}_{i}", [b, i]) for i in range(10)]
        for b in range(4)
    }

    def writer(b):
        return merge_batch(
            t, batch(spark, batches[b]), batch_id=b, job_id="conc"
        )

    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(writer, range(4)))

    assert all(not r.skipped for r in results)
    snap = t.snapshot()
    assert snap.version == 4                      # four sequential commits
    assert {f"conc/{b}" for b in range(4)} <= set(snap.committed)
    rows = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    assert len(rows) == 40                        # no lost updates
    for b in range(4):
        assert rows[f"doc{b}_0"] == [b, 0]
    # replay of any batch after the race is a manifest skip
    assert merge_batch(t, batch(spark, batches[2]), batch_id=2,
                       job_id="conc").skipped
