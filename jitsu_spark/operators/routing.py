"""Table-name routing (P15 + F1 in SURVEY.md §2.2/2.3).

The reference evaluates a Go text/template per event to pick the target
table (multiplex-by-content; semantics per /root/reference/server/schema/
table_name_extractor.go:19-66 — re-derived) and SKIPS events whose
template evaluates empty. Here the template is a restricted format string
compiled to one Spark expression:

    "events_{event_type}"          -> concat of literal + column
    "events_{ts:yyyy_MM}"          -> date_format(ts, 'yyyy_MM')
    "{user_id}"                    -> column value

The result is normalized like the reference (lowercase, specials -> '_')
and lands in a ``_table`` column; rows with empty/NULL table are dropped
(counted upstream via observe). For the single-table CDC engine the same
expression doubles as a partition selector.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jitsu_spark.operators.flatten import normalize_name

_TOKEN_RE = re.compile(r"\{([^}]+)\}")


def table_name_expr(template: str) -> Column:
    parts: list[Column] = []
    pos = 0
    for m in _TOKEN_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        body = m.group(1)
        if ":" in body:
            col, fmt = body.split(":", 1)
            parts.append(F.date_format(F.col(col.strip()), fmt.strip()))
        else:
            parts.append(F.col(body.strip()).cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    raw = F.concat_ws("", *parts)
    # reference Reformat: lowercase + specials -> '_'
    return F.regexp_replace(
        F.regexp_replace(F.lower(raw), r"[()\[\]{}$@!#%&,.;:^\-\s]", "_"),
        r"[^a-z0-9_]",
        "_",
    )


def route_to_tables(
    df: DataFrame, template: str, table_col: str = "_table"
) -> DataFrame:
    """Stamp the routed table name and drop skip-rows (empty template
    result == skip event, the reference's F1 filter)."""
    out = df.withColumn(table_col, table_name_expr(template))
    return out.filter(
        F.col(table_col).isNotNull() & (F.col(table_col) != F.lit(""))
    )


__all__ = ["table_name_expr", "route_to_tables", "normalize_name"]
