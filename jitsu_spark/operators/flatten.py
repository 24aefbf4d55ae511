"""Flatten operator (P9 in SURVEY.md §2.2).

Reference semantics (re-derived from /root/reference/server/schema/
flattener.go:34-110, no code ported):

- nested objects flatten to ``parent_child`` columns, recursively;
- arrays are serialized to JSON strings (the reference stores no native
  array columns; our engine keeps real ArrayType for the ``tokens``
  payload and applies JSON-stringification only where Jitsu flattening
  semantics are requested);
- maps (dynamic keys) are serialized to JSON strings — a columnar engine
  cannot statically explode unknown keys; the reference handles them
  per-row, we keep the whole map as one JSON column;
- key names are normalized: lowercased, ``( ) $ [ ] { } @ ! # % & , . ;
  : ^ - `` and space replaced by ``_``.

The whole operator compiles, driver-side, to ONE ``select`` over schema —
a narrow projection inside whole-stage codegen. No UDFs, no shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NORM_RE = re.compile(r"[()\[\]{}$@!#%&,.;:^\-\s]")
_NON_IDENT_RE = re.compile(r"[^a-z0-9_]")


def normalize_name(name: str) -> str:
    """Lowercase + special characters -> '_' (reference Reformat rules)."""
    s = _NORM_RE.sub("_", name.lower())
    return _NON_IDENT_RE.sub("_", s)


def _flatten_cols(
    dtype: T.DataType, col: Column, prefix: str, out: list[Column]
) -> None:
    if isinstance(dtype, T.StructType):
        for f in dtype.fields:
            name = normalize_name(f.name)
            child_prefix = f"{prefix}_{name}" if prefix else name
            _flatten_cols(f.dataType, col.getField(f.name), child_prefix, out)
    elif isinstance(dtype, (T.ArrayType, T.MapType)):
        out.append(F.to_json(col).alias(prefix))
    else:
        out.append(col.alias(prefix))


def flatten(df: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Flatten every nested column of ``df`` per the reference semantics.

    ``keep`` columns pass through untouched (e.g. ``tokens`` arrays that
    must stay native for the lake table).
    """
    cols: list[Column] = []
    for f in df.schema.fields:
        if f.name in keep:
            cols.append(F.col(f.name))
        else:
            _flatten_cols(f.dataType, F.col(f.name), normalize_name(f.name), cols)
    return df.select(*cols)


def flatten_json_col(
    df: DataFrame, json_col: str, schema: T.StructType
) -> DataFrame:
    """Parse a JSON-string column with ``schema`` then flatten it in place
    (S4 NDJSON parse + P9 flatten in one projection)."""
    parsed = df.withColumn(json_col, F.from_json(F.col(json_col), schema))
    other = [F.col(c) for c in df.columns if c != json_col]
    nested: list[Column] = []
    _flatten_cols(schema, F.col(json_col), normalize_name(json_col), nested)
    return parsed.select(*other, *nested)
