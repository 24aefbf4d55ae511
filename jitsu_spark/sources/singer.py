"""Singer-tap message parsing (S9).

The reference runs Singer taps as subprocesses and consumes their stdout
(/root/reference/server/drivers/singer*.go); the tap PROTOCOL itself is
public and simple — newline-delimited JSON messages of three types
(SCHEMA / RECORD / STATE, per the open Singer spec). The subprocess
plumbing is an orchestration concern; the engine part is parsing the
message stream at scale, which is columnar JSON work:

- ``split_singer_messages``: one narrow pass tags each line's type and
  stream — RECORD/SCHEMA/STATE slices come out as filtered projections
  of the same scan (no shuffle).
- ``singer_records``: typed extraction of one stream's records via
  ``from_json`` with an explicit schema (never schema inference over
  10^10 lines); unparsable records land in a ``_corrupt`` column for the
  dead-letter path, same as the NDJSON reader.
- ``latest_state``: Singer taps emit STATE bookmarks interleaved with
  records; the LAST state line is the resume bookmark. An ``order_col``
  must provide the stream order (files: a line number / offset; Kafka:
  the offset) — "last" is meaningless without one.

Feeding the parsed records onward is the normal path: merge_batch for
key'd streams (Singer key_properties == the merge key), append_batch
for append-only streams.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class SingerMessages:
    records: DataFrame  # (stream, record_json, record_version, <order_col>)
    schemas: DataFrame  # (stream, schema_json, key_properties)
    states: DataFrame  # (state_json, <order_col>)
    # ACTIVATE_VERSION messages (public Singer FULL_TABLE contract):
    # (stream, version, <order_col>) — on activation, destination rows
    # from OLDER versions are purged
    activates: DataFrame | None = None


def split_singer_messages(
    df: DataFrame, line_col: str = "value", order_col: str | None = None
) -> SingerMessages:
    """Split raw tap output lines into the message families."""
    extra = [order_col] if order_col else []
    tagged = df.select(
        F.get_json_object(F.col(line_col), "$.type").alias("_t"),
        F.get_json_object(F.col(line_col), "$.stream").alias("stream"),
        F.col(line_col),
        *[F.col(c) for c in extra],
    )
    records = tagged.filter(F.col("_t") == "RECORD").select(
        "stream",
        F.get_json_object(F.col(line_col), "$.record").alias("record_json"),
        # FULL_TABLE taps stamp a table version on each record
        F.get_json_object(F.col(line_col), "$.version")
        .cast("long")
        .alias("record_version"),
        *extra,
    )
    schemas = tagged.filter(F.col("_t") == "SCHEMA").select(
        "stream",
        F.get_json_object(F.col(line_col), "$.schema").alias("schema_json"),
        F.from_json(
            F.get_json_object(F.col(line_col), "$.key_properties"),
            T.ArrayType(T.StringType()),
        ).alias("key_properties"),
        *extra,
    )
    states = tagged.filter(F.col("_t") == "STATE").select(
        F.get_json_object(F.col(line_col), "$.value").alias("state_json"),
        *extra,
    )
    activates = tagged.filter(F.col("_t") == "ACTIVATE_VERSION").select(
        "stream",
        F.get_json_object(F.col(line_col), "$.version")
        .cast("long")
        .alias("version"),
        *extra,
    )
    return SingerMessages(
        records=records, schemas=schemas, states=states, activates=activates
    )


def singer_records(
    messages: SingerMessages, stream: str, record_schema: T.StructType
) -> DataFrame:
    """Typed records of one stream; rows whose record fails the schema
    keep the raw json in ``_corrupt`` (dead-letter split upstream)."""
    with_corrupt = T.StructType(
        list(record_schema.fields) + [T.StructField("_corrupt", T.StringType())]
    )
    parsed = messages.records.filter(F.col("stream") == stream).withColumn(
        "_parsed",
        F.from_json(
            F.col("record_json"),
            with_corrupt,
            {"columnNameOfCorruptRecord": "_corrupt", "mode": "PERMISSIVE"},
        ),
    )
    return parsed.select("_parsed.*")


def latest_state(messages: SingerMessages, order_col: str) -> str | None:
    """The resume bookmark: the state json with the highest order value
    (driver-side single row — state lines are rare)."""
    row = (
        messages.states.orderBy(F.col(order_col).desc()).limit(1).collect()
    )
    return row[0]["state_json"] if row else None
