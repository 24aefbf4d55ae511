from jitsu_spark.sources.readers import (
    parse_fallback_envelope,
    read_csv_typed,
    read_ndjson,
    split_malformed,
)
from jitsu_spark.sources.interval_sync import (
    IntervalDriver,
    IntervalSyncJob,
    TimeInterval,
)
from jitsu_spark.sources.singer import (
    SingerMessages,
    latest_state,
    singer_records,
    split_singer_messages,
)
from jitsu_spark.sources.stream_sources import (
    FileSource,
    KafkaSource,
    RateSource,
    StreamSource,
    default_rate_envelope,
)

__all__ = [
    "read_ndjson",
    "read_csv_typed",
    "parse_fallback_envelope",
    "split_malformed",
    "StreamSource",
    "FileSource",
    "RateSource",
    "KafkaSource",
    "default_rate_envelope",
    "IntervalDriver",
    "IntervalSyncJob",
    "TimeInterval",
    "SingerMessages",
    "split_singer_messages",
    "singer_records",
    "latest_state",
]
