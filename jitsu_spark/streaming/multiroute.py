"""Multi-destination routed merge: one micro-batch fans out into N lake
tables by the ``_table`` routing column — the reference's core storing
behavior (every batch splits per destination table and each table is
written independently; semantics per the per-(file, storage, table)
status tracking in /root/reference/server/logfiles/status_manager.go and
the multiplex loop in server/destinations — re-derived).

Exactly-once composes per table: each destination's own commit manifest
records (job_id:table, batch_id), so a redelivered batch skips exactly
the tables that already committed and applies the rest — a crash between
two destination merges heals on replay with no duplicates and no loss
(tested).

Scale notes: the distinct-table pass collects ONLY the table names
(bounded by the destination count — time-partitioned routing yields a
handful); each per-table merge then prunes its own slice with a pushed
``_table = name`` filter over the cached batch. Tables are created
lazily on first routed row with the batch's payload schema and evolve
independently afterwards.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jitsu_spark.lake.merge import MergeResult, merge_batch
from jitsu_spark.lake.table import LakeTable

_SAFE_NAME = re.compile(r"^[a-z0-9_]+$")


@dataclass
class RoutedMergeResult:
    per_table: dict[str, MergeResult] = field(default_factory=dict)


def multiplex_by_token(
    batch_df: DataFrame,
    token_map: dict[str, list[str]],
    token_col: str = "api_key",
    table_col: str = "_table",
    keep_unmatched: bool = False,
) -> DataFrame:
    """Token multiplexing (F4): fan each event out to EVERY destination
    configured for its api token, as one routed row per destination.

    Reference semantics: the per-token consumer loop in
    /root/reference/server/handlers/event.go:92-108 (token ->
    GetConsumers(tokenID) -> Consume per consumer) — re-derived, no code
    ported. Spark-first: the (token, destination) pairs form a tiny
    broadcast dim; the fan-out is one broadcast inner join, so the event
    stream never shuffles and an event with a k-destination token becomes
    k routed rows. Events whose token has no destination are dropped
    (the reference 400s them); pass ``keep_unmatched=True`` to keep them
    with a NULL ``table_col`` for a dead-letter path instead.

    Feed the result to :func:`merge_routed` — each destination keeps its
    own exactly-once manifest."""
    spark = batch_df.sparkSession
    pairs = [
        (tok, dest) for tok, dests in token_map.items() for dest in dests
    ]
    if not pairs:
        raise ValueError("token_map has no (token, destination) pairs")
    dim = spark.createDataFrame(
        pairs, f"{token_col} string, {table_col} string"
    )
    how = "left" if keep_unmatched else "inner"
    return batch_df.join(F.broadcast(dim), on=token_col, how=how)


def merge_routed(
    spark: SparkSession,
    root: str,
    batch_df: DataFrame,
    key_field: str,
    batch_id=None,
    job_id: str = "routed",
    table_col: str = "_table",
    n_buckets: int = 16,
    properties: dict | None = None,
) -> RoutedMergeResult:
    """Merge one routed batch into per-table LakeTables under ``root``.

    ``batch_df`` carries the CDC envelope plus ``table_col`` (from
    ``route_to_tables``); rows are sliced per table name and merged into
    ``<root>/<name>`` with that table's own exactly-once manifest."""
    batch_df = batch_df.persist()
    try:
        names = sorted(
            r[0]
            for r in batch_df.select(table_col).distinct().collect()
            if r[0]
        )
        out = RoutedMergeResult()
        for name in names:
            if not _SAFE_NAME.match(name):
                raise ValueError(f"unsafe routed table name {name!r}")
            sub = batch_df.filter(F.col(table_col) == name).drop(table_col)
            path = os.path.join(root, name)
            if LakeTable.exists(path):
                table = LakeTable.load(spark, path)
            else:
                payload = T.StructType(
                    [f for f in sub.schema.fields if f.name not in ("seq", "op")]
                )
                table = LakeTable.create(
                    spark, path, payload, key_field,
                    n_buckets=n_buckets, properties=properties or {},
                )
            out.per_table[name] = merge_batch(
                table, sub, batch_id=batch_id, job_id=f"{job_id}:{name}"
            )
        return out
    finally:
        batch_df.unpersist()
