"""Source readers (S4-S6) + dead-letter split (W11 ingest side).

Reference behaviors re-expressed (semantics from /root/reference/server/
parsers/json.go:10-36 and parsers/csv.go:14-56 — re-derived):

- NDJSON: one JSON object per line; malformed lines must not kill the
  batch — they become dead-letter rows carrying the raw line (the
  reference wraps them as FailedEvent {event, error}).
- Fallback envelope: dead-letter files hold ``{"event": {...}, "error":
  "..."}``; replay unwraps the original event (S5).
- CSV: header names normalized (lowercase, specials -> '_'), explicit
  per-column type casts (S6).

All columnar: PERMISSIVE-mode JSON parsing with a corrupt-record column
replaces per-row try/except.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jitsu_spark.operators.flatten import normalize_name

CORRUPT_COL = "_corrupt_record"


def read_ndjson(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read NDJSON; returns (good_rows, dead_letter_rows). Dead letters
    carry the raw line + a parse-error marker (FailedEvent analog)."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()  # required: corrupt-record column needs a raw-parse pass
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw"),
        F.lit("malformed json").alias("error"),
    )
    return good, bad


def parse_fallback_envelope(
    df: DataFrame, payload_schema: T.StructType, envelope_col: str = "raw"
) -> DataFrame:
    """Unwrap dead-letter envelopes ``{"event": ..., "error": ...}`` back
    into typed event rows (S5; replay path of the fallback service)."""
    env_schema = T.StructType(
        [
            T.StructField("event", payload_schema),
            T.StructField("error", T.StringType()),
        ]
    )
    parsed = df.select(
        F.from_json(F.col(envelope_col), env_schema).alias("_env")
    )
    return parsed.select("_env.event.*")


def read_csv_typed(
    spark: SparkSession,
    path: str,
    type_casts: dict[str, str] | None = None,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with normalized headers + explicit casts (S6). ``type_casts``
    maps (normalized) column name -> Spark type string."""
    df = (
        spark.read.option("header", "true")
        .option("delimiter", delimiter)
        .csv(path)
    )
    cols = []
    casts = type_casts or {}
    for c in df.columns:
        name = normalize_name(c)
        col = F.col(f"`{c}`")
        if name in casts:
            t = casts[name]
            col = F.to_timestamp(col) if t == "timestamp" else col.cast(t)
        cols.append(col.alias(name))
    return df.select(*cols)


def split_malformed(
    df: DataFrame, json_col: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Split rows whose ``json_col`` fails to parse under ``schema`` into
    (good_with_parsed_struct, dead_letter) — the in-flight analog of
    read_ndjson for JSON columns inside an already-typed stream.

    NB: PERMISSIVE ``from_json`` returns a NULL-FILLED STRUCT (not NULL)
    for malformed input, so detection goes through a corrupt-record field
    inside the parse schema."""
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = df.withColumn(
        "_parsed",
        F.from_json(
            F.col(json_col),
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
    )
    is_bad = F.col(f"_parsed.{CORRUPT_COL}").isNotNull()
    good = parsed.filter(~is_bad | F.col(json_col).isNull()).withColumn(
        "_parsed", F.col("_parsed").dropFields(CORRUPT_COL)
    )
    bad = parsed.filter(is_bad & F.col(json_col).isNotNull()).select(
        F.col(json_col).alias("raw"), F.lit("malformed json").alias("error")
    )
    return good, bad
