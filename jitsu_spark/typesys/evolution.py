"""Driver-side schema-evolution planner.

Given the table's current logical schema and an incoming batch's observed
schema, compute the widened logical schema (new columns appended; common
columns widened per the LCA lattice / structural widening in lattice.py).
This reproduces the reference's BatchHeader merge + Table.Diff + patch flow
(semantics per /root/reference/server/schema/batch_header.go:22-95 and
server/adapters/table.go:52-87 — re-derived, nothing ported): columns are
only ever ADDED or WIDENED, never dropped or narrowed, so readers of old
snapshots stay valid and old files remain readable via cast-on-read.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from jitsu_spark.typesys.lattice import widen_spark_types


class SchemaTooWideError(TypeError):
    """Evolved schema would exceed the table's max_columns guard (D7;
    semantics per /root/reference/server/storages/table_helper.go:94-100:
    count of existing + added columns checked against a configurable cap
    — here it rejects instead of warning, since unbounded growth from a
    dynamic payload is an operator error at scale)."""


MAX_COLUMNS_PROP = "schema.max_columns"


@dataclass
class EvolutionPlan:
    target: T.StructType
    added: list[str] = field(default_factory=list)
    widened: list[tuple[str, str, str]] = field(default_factory=list)  # col, old, new

    @property
    def changed(self) -> bool:
        return bool(self.added or self.widened)


def plan_evolution(
    table_schema: T.StructType,
    batch_schema: T.StructType,
    frozen: tuple[str, ...] = (),
    max_columns: int | None = None,
) -> EvolutionPlan:
    """Widened union of the two schemas. ``frozen`` columns (e.g. the merge
    key) must not change type — a type conflict there is an error; an
    evolved schema wider than ``max_columns`` raises SchemaTooWideError."""
    batch = {f.name: f.dataType for f in batch_schema.fields}
    out: list[T.StructField] = []
    plan = EvolutionPlan(target=T.StructType([]))
    for f in table_schema.fields:
        if f.name in batch and not _same(batch[f.name], f.dataType):
            if f.name in frozen:
                raise TypeError(
                    f"merge key / frozen column {f.name!r} cannot change type "
                    f"({f.dataType.simpleString()} vs {batch[f.name].simpleString()})"
                )
            wide = widen_spark_types(f.dataType, batch[f.name])
            if not _same(wide, f.dataType):
                plan.widened.append(
                    (f.name, f.dataType.simpleString(), wide.simpleString())
                )
            out.append(T.StructField(f.name, wide, True))
        else:
            out.append(T.StructField(f.name, f.dataType, True))
    known = {f.name for f in table_schema.fields}
    for f in batch_schema.fields:
        if f.name not in known:
            plan.added.append(f.name)
            out.append(T.StructField(f.name, f.dataType, True))
    plan.target = T.StructType(out)
    if max_columns is not None and len(out) > max_columns:
        raise SchemaTooWideError(
            f"evolved schema has {len(out)} columns "
            f"(> {MAX_COLUMNS_PROP}={max_columns}); new: {plan.added}"
        )
    return plan


def max_columns_of(properties: dict) -> int | None:
    """Read the table's max_columns guard from its properties (0/absent =
    unlimited, matching the reference's th.maxColumns > 0 gate)."""
    return int(properties.get(MAX_COLUMNS_PROP, 0)) or None


def _same(a: T.DataType, b: T.DataType) -> bool:
    return a.simpleString() == b.simpleString()
