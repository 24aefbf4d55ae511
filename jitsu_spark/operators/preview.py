"""Dry-run event preview — run a batch through the transform/route/typing
pipeline and report exactly what WOULD land, without writing anything.

Reference semantics (re-derived): the dry-run handler pushes one event
through enrichment + the destination's schema processor and returns the
mapped table fields with their SQL types and values, committing nothing
(/root/reference/server/handlers/dry_run.go:23-60,
storages/utils.go:20-34). Here the same idea is batch-shaped: the preview
runs the SAME stages the streaming runner applies (user event function ->
transform -> table routing), then plans schema evolution against each
routed destination and renders the DDL delta that a real merge would
apply — add/widen plans, CREATE statements for brand-new tables, per-field
SQL types with a sample value.

Everything stays lazy except two bounded actions per routed table: the
distinct routed-table list (<= number of tables) and an optional
``limit(1)`` sample row for field values (the reference returns the
event's values the same way).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jitsu_spark.lake.export_ddl import (
    alter_table_ddl,
    column_type,
    create_table_ddl,
)
from jitsu_spark.lake.table import LakeTable
from jitsu_spark.operators.routing import route_to_tables
from jitsu_spark.typesys.evolution import max_columns_of, plan_evolution


@dataclass
class TablePreview:
    table: str
    frame: DataFrame  # the typed rows that WOULD merge (lazy)
    fields: list[dict]  # {field, spark_type, sql_type, value}
    ddl: list[str]  # CREATE (new table) or ALTER delta (existing)
    added: list[str] = field(default_factory=list)
    widened: list[str] = field(default_factory=list)
    exists: bool = False


@dataclass
class TransformPreviewResult:
    tables: dict[str, TablePreview]

    def ddl(self) -> list[str]:
        return [s for t in self.tables.values() for s in t.ddl]


def transform_preview(
    batch_df: DataFrame,
    destinations: dict[str, LakeTable] | None = None,
    table_template: str = "events",
    event_fn: Callable | None = None,
    event_fn_schema: T.StructType | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    dialect: str = "postgres",
    key_field: str | None = None,
    with_values: bool = True,
    drop_cols: tuple[str, ...] = ("seq", "op"),
) -> TransformPreviewResult:
    """Preview the routed/flattened/typed outcome of a batch.

    ``destinations`` maps routed table names to existing LakeTables; a
    routed name with no entry previews as a CREATE. The stage order is
    identical to :class:`~jitsu_spark.streaming.runner.CdcStreamJob`
    (event_fn -> transform -> routing), so the preview IS what a real run
    would merge — asserted by tests/test_operators.py."""
    df = batch_df
    if event_fn is not None:
        from jitsu_spark.operators.transform import (
            split_dead_letter,
            transform_events,
        )

        df, _dead = split_dead_letter(
            transform_events(df, event_fn, event_fn_schema)
        )
    if transform is not None:
        df = transform(df)
    routed = route_to_tables(df, table_template)

    destinations = destinations or {}
    names = [r["_table"] for r in routed.select("_table").distinct().collect()]
    out: dict[str, TablePreview] = {}
    for name in sorted(names):
        part = routed.filter(F.col("_table") == name).drop("_table")
        payload = part.drop(*[c for c in drop_cols if c in part.columns])
        dest = destinations.get(name)
        if dest is not None:
            snap = dest.snapshot()
            plan = plan_evolution(
                dest.schema(),
                payload.schema,
                frozen=(snap.key_field,),
                max_columns=max_columns_of(snap.properties),
            )
            target = plan.target
            ddl = alter_table_ddl(dest.schema(), target, name, dialect)
            added, widened = list(plan.added), list(plan.widened)
            exists = True
        else:
            target = payload.schema
            ddl = [
                create_table_ddl(
                    target, name, dialect, key_field=key_field
                )
            ]
            added, widened = [f.name for f in target.fields], []
            exists = False
        sample = (
            payload.limit(1).collect()[0].asDict() if with_values else {}
        )
        fields = [
            {
                "field": f.name,
                "spark_type": f.dataType.simpleString(),
                "sql_type": column_type(f.dataType, dialect),
                "value": sample.get(f.name),
            }
            for f in target.fields
        ]
        out[name] = TablePreview(
            table=name,
            frame=payload,
            fields=fields,
            ddl=ddl,
            added=added,
            widened=widened,
            exists=exists,
        )
    return TransformPreviewResult(tables=out)
