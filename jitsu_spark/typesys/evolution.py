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
) -> EvolutionPlan:
    """Widened union of the two schemas. ``frozen`` columns (e.g. the merge
    key) must not change type — a type conflict there is an error."""
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
    return plan


def _same(a: T.DataType, b: T.DataType) -> bool:
    return a.simpleString() == b.simpleString()
