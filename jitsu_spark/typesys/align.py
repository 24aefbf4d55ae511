"""Columnar schema alignment: cast a DataFrame to a target logical schema.

This is the data-plane half of schema evolution. The driver-side lattice
decides the widened logical schema; this module generates ONE narrow
projection (no shuffle, whole-stage-codegen friendly) that:

- adds missing columns as typed NULLs (old files read after ADD COLUMN),
- casts narrower physical types to the widened logical type
  (int->long, int->double, float->double, bool->string, ...),
- stringifies complex types with ``to_json`` when the logical type widened
  to STRING (the reference's arrays-to-JSON-string semantics,
  /root/reference/server/schema/flattener.go:70-74 — behavior only),
- formats timestamps widened to STRING in the reference's canonical ISO
  micros format (format per /root/reference/server/timestamp/format.go:9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ISO_MICROS = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"


def cast_expr(col: Column, src: T.DataType, dst: T.DataType) -> Column:
    """A single expression casting ``col`` from physical ``src`` to logical
    ``dst``. Pure built-ins — never a Python UDF."""
    if src == dst:
        return col
    if isinstance(dst, T.StringType):
        if isinstance(src, (T.ArrayType, T.StructType, T.MapType)):
            return F.to_json(col)
        if isinstance(src, (T.TimestampType, T.TimestampNTZType)):
            return F.date_format(col, ISO_MICROS)
        if isinstance(src, T.BooleanType):
            return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
                F.when(col, F.lit("true")).otherwise(F.lit("false"))
            )
        return col.cast("string")
    if isinstance(dst, T.ArrayType) and isinstance(src, T.ArrayType):
        return F.transform(
            col, lambda x: cast_expr(x, src.elementType, dst.elementType)
        )
    if isinstance(dst, T.StructType) and isinstance(src, T.StructType):
        src_fields = {f.name: f.dataType for f in src.fields}
        parts = []
        for f in dst.fields:
            if f.name in src_fields:
                parts.append(
                    cast_expr(col.getField(f.name), src_fields[f.name], f.dataType
                              ).alias(f.name)
                )
            else:
                parts.append(F.lit(None).cast(f.dataType).alias(f.name))
        return F.struct(*parts)
    if isinstance(dst, T.TimestampType) and isinstance(src, T.StringType):
        return F.to_timestamp(col)
    return col.cast(dst)


def alignment_columns(df: DataFrame, target: T.StructType) -> list[Column]:
    """Column expressions projecting ``df`` onto ``target`` (missing columns
    become typed NULLs; present ones are widened with ``cast_expr``)."""
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in have:
            cols.append(cast_expr(F.col(f.name), have[f.name], f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return cols


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` onto ``target``: add missing columns as NULL, cast the
    rest. Extra columns in ``df`` are dropped. One select — no shuffle."""
    return df.select(*alignment_columns(df, target))
