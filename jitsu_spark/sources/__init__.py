from jitsu_spark.sources.readers import (
    parse_fallback_envelope,
    read_csv_typed,
    read_ndjson,
    split_malformed,
)

__all__ = [
    "read_ndjson",
    "read_csv_typed",
    "parse_fallback_envelope",
    "split_malformed",
]
