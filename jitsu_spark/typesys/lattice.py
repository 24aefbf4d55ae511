"""Scalar type lattice for dynamic schema widening.

The reference engine resolves multi-typed columns via lowest-common-ancestor
on a typecast tree (semantics per /root/reference/server/typing/converter.go:12-32,
110-133 and datatype.go:15-30 — behavior re-derived, no code ported):

        STRING
       /      \\
   FLOAT64   TIMESTAMP
      |
    INT64
      |
     BOOL

so e.g. INT64 ⊔ FLOAT64 = FLOAT64, FLOAT64 ⊔ TIMESTAMP = STRING,
BOOL ⊔ STRING = STRING. Anything unrepresentable resolves to STRING
(everything has a string form), mirroring the reference's convert rules.

This module is pure Python (driver-side, operates on schemas only — never on
data). The data-plane widening is a single columnar ``cast`` generated from
the decisions made here.
"""

from __future__ import annotations

import enum

from pyspark.sql import types as T


class DataType(enum.IntEnum):
    """Logical scalar types, ordered like the reference's enum."""

    UNKNOWN = 0
    BOOL = 1
    INT64 = 2
    FLOAT64 = 3
    STRING = 4
    TIMESTAMP = 5


# child -> parent edges of the typecast tree (STRING is the root).
_PARENT: dict[DataType, DataType | None] = {
    DataType.BOOL: DataType.INT64,
    DataType.INT64: DataType.FLOAT64,
    DataType.FLOAT64: DataType.STRING,
    DataType.TIMESTAMP: DataType.STRING,
    DataType.STRING: None,
}


def _ancestors(t: DataType) -> list[DataType]:
    """Path from t (inclusive) to the root."""
    path = [t]
    while (p := _PARENT.get(path[-1])) is not None:
        path.append(p)
    return path


def common_ancestor(a: DataType, b: DataType) -> DataType:
    """Lowest common ancestor of two scalar types on the typecast tree."""
    if a == DataType.UNKNOWN or b == DataType.UNKNOWN:
        return DataType.UNKNOWN
    if a == b:
        return a
    bs = _ancestors(b)
    for cand in _ancestors(a):
        if cand in bs:
            return cand
    return DataType.STRING


def fold_types(types: list[DataType]) -> DataType:
    """LCA-fold a set of observed types for one column."""
    if not types:
        return DataType.UNKNOWN
    acc = types[0]
    for t in types[1:]:
        acc = common_ancestor(acc, t)
    return acc


# ---------------------------------------------------------------------------
# Spark <-> logical mapping
# ---------------------------------------------------------------------------

_TO_SPARK: dict[DataType, T.DataType] = {
    DataType.BOOL: T.BooleanType(),
    DataType.INT64: T.LongType(),
    DataType.FLOAT64: T.DoubleType(),
    DataType.STRING: T.StringType(),
    DataType.TIMESTAMP: T.TimestampType(),
}


def spark_type_for(t: DataType) -> T.DataType:
    if t not in _TO_SPARK:
        raise ValueError(f"no Spark type for {t!r}")
    return _TO_SPARK[t]


def datatype_for_spark(st: T.DataType) -> DataType:
    """Map a Spark scalar type onto the lattice. Complex types -> UNKNOWN
    (they are widened structurally by ``widen_spark_types``)."""
    if isinstance(st, T.BooleanType):
        return DataType.BOOL
    if isinstance(st, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return DataType.INT64
    if isinstance(st, (T.FloatType, T.DoubleType, T.DecimalType)):
        return DataType.FLOAT64
    if isinstance(st, T.StringType):
        return DataType.STRING
    if isinstance(st, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return DataType.TIMESTAMP
    return DataType.UNKNOWN


_INT_WIDTH = {T.ByteType: 1, T.ShortType: 2, T.IntegerType: 4, T.LongType: 8}


def widen_spark_types(a: T.DataType, b: T.DataType) -> T.DataType:
    """Widen two *physical* Spark types to a common supertype.

    Scalars follow the LCA lattice but preserve narrow physical widths when
    both sides agree (int ⊔ int = int; int ⊔ long = long; float ⊔ float =
    float). Arrays widen elementwise; structs widen field-wise (union of
    fields); any irreconcilable pair falls back to StringType (JSON form),
    mirroring the reference's arrays-to-JSON-string behavior.
    """
    if a == b:
        return a
    # identical class, nullability-insensitive
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(widen_spark_types(a.elementType, b.elementType), True)
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        fields: dict[str, T.DataType] = {}
        order: list[str] = []
        for f in list(a.fields) + list(b.fields):
            if f.name in fields:
                fields[f.name] = widen_spark_types(fields[f.name], f.dataType)
            else:
                fields[f.name] = f.dataType
                order.append(f.name)
        return T.StructType([T.StructField(n, fields[n], True) for n in order])
    if isinstance(a, (T.ArrayType, T.StructType, T.MapType)) or isinstance(
        b, (T.ArrayType, T.StructType, T.MapType)
    ):
        # complex vs anything-else -> JSON string
        return T.StringType()
    # both-integral: keep the wider physical int
    if type(a) in _INT_WIDTH and type(b) in _INT_WIDTH:
        return a if _INT_WIDTH[type(a)] >= _INT_WIDTH[type(b)] else b
    if isinstance(a, (T.FloatType, T.DoubleType)) and isinstance(
        b, (T.FloatType, T.DoubleType)
    ):
        return T.DoubleType()
    la, lb = datatype_for_spark(a), datatype_for_spark(b)
    lca = common_ancestor(la, lb)
    if lca == DataType.UNKNOWN:
        return T.StringType()
    # float stays float when widened from an int no wider than 4 bytes? No:
    # reference semantics promote to FLOAT64 (double) — keep it simple/exact.
    return spark_type_for(lca)
