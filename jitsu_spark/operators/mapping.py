"""Field-mapping rule compiler (P3-P8 in SURVEY.md §2.2).

Re-expresses the reference's JSONPath mapping actions (semantics per
/root/reference/server/schema/field_mapper.go:86-175 — re-derived) as a
rule list compiled into ONE DataFrame projection over flattened columns:

- MOVE    ``/a/b -> /c``            rename column a_b to c
- REMOVE  ``/a/b -> ``              drop column a_b
- CAST    ``/a -> (integer) /a``    cast in place (applied at transform
                                    time; the reference deferred to DDL)
- CONSTANT ``-> /v``                literal column

``keep_unmapped=False`` (the reference's "strict" mode) starts from the
empty projection and keeps only rule outputs; the default passes through
all unmapped columns. Path segments are joined with '_' to match the
flatten operator's naming.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jitsu_spark.operators.flatten import normalize_name

_CAST_TYPES = {
    "integer": "long",
    "long": "long",
    "double": "double",
    "float": "double",
    "string": "string",
    "bool": "boolean",
    "boolean": "boolean",
    "timestamp": "timestamp",
    "date": "date",
}


@dataclass
class MappingRule:
    kind: str  # move | remove | cast | constant
    src: str | None = None
    dst: str | None = None
    cast_type: str | None = None
    value: object | None = None


def _path_to_col(path: str) -> str:
    parts = [normalize_name(p) for p in path.strip().strip("/").split("/") if p]
    return "_".join(parts)


_RULE_RE = re.compile(
    r"^\s*(?P<src>/[^\s>]*)?\s*->\s*(?:\((?P<type>\w+)\)\s*)?(?P<dst>/[^\s]*)?\s*$"
)


def parse_rule(spec: str) -> MappingRule:
    """Parse the reference's old-style mapping string, e.g.
    ``"/a/b -> (integer) /c"``, ``"/drop/me -> "`` (remove)."""
    m = _RULE_RE.match(spec)
    if not m:
        raise ValueError(f"unparseable mapping rule: {spec!r}")
    src, typ, dst = m.group("src"), m.group("type"), m.group("dst")
    if src and not dst:
        return MappingRule(kind="remove", src=_path_to_col(src))
    if not src and dst:
        raise ValueError(f"constant rule needs an explicit value: {spec!r}")
    if typ:
        return MappingRule(
            kind="cast", src=_path_to_col(src), dst=_path_to_col(dst),
            cast_type=typ.lower(),
        )
    return MappingRule(kind="move", src=_path_to_col(src), dst=_path_to_col(dst))


def apply_mappings(
    df: DataFrame, rules: list[MappingRule], keep_unmapped: bool = True
) -> DataFrame:
    """Compile the rule list to a single ``select`` (narrow, codegen-fused)."""
    consumed: set[str] = set()
    produced: dict[str, Column] = {}
    for r in rules:
        if r.kind == "remove":
            consumed.add(r.src)
            continue
        if r.kind == "constant":
            produced[r.dst] = F.lit(r.value)
            continue
        if r.src not in df.columns:
            continue  # mapping over an absent field is a no-op (ref behavior)
        col = F.col(r.src)
        if r.kind == "cast":
            spark_t = _CAST_TYPES.get(r.cast_type)
            if spark_t is None:
                raise ValueError(f"unsupported cast type {r.cast_type!r}")
            col = F.to_timestamp(col) if spark_t == "timestamp" else col.cast(spark_t)
        produced[r.dst or r.src] = col
        consumed.add(r.src)
    cols: list[Column] = []
    if keep_unmapped:
        for c in df.columns:
            if c not in consumed and c not in produced:
                cols.append(F.col(c))
    cols += [col.alias(name) for name, col in produced.items()]
    if not cols:
        raise ValueError("mapping produced an empty projection")
    return df.select(*cols)
