"""Offset-based streaming-source abstraction (S7/S8 + the Kafka seam).

The reference's stream mode is fed by a persistent queue
(/root/reference/server/events/persistent_queue.go:65-87) and its pull
sources implement a driver interface
(/root/reference/server/drivers/driver.go:8-22) — both are "give me the
next ordered chunk after offset X". Spark's Structured Streaming sources
are exactly that contract (offsets in the checkpoint log), so the engine
models a source as anything that can open a streaming DataFrame; the
micro-batch composition, offset tracking, and replay-determinism come
from Spark, and exactly-once comes from the merge kernel's commit
manifest (same three-layer story as runner.py).

Implementations:
- ``FileSource``   — directory tail (parquet/NDJSON); the round-1 path.
- ``RateSource``   — Spark's ``rate`` source mapped to CDC envelopes by a
  deterministic projection: ``value`` is the monotone offset, so replays
  rebuild byte-identical batches. This is the in-sandbox stand-in for any
  offset-ordered broker and what the resume tests drive.
- ``KafkaSource``  — the production seam: builds the standard
  ``format("kafka")`` reader (spark-sql-kafka jars required on a real
  cluster — absent here by design, so construction is lazy) and projects
  the binary envelope through a caller-supplied parser. Offsets ride the
  same checkpoint mechanism; nothing else in the engine changes.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class StreamSource:
    """A source = anything that opens a streaming DataFrame of
    change-event envelopes (seq/op/doc_id + payload)."""

    def read_stream(self, spark: SparkSession) -> DataFrame:  # pragma: no cover
        raise NotImplementedError


@dataclass
class FileSource(StreamSource):
    """Tail a directory of change-log files (parquet or NDJSON)."""

    source_dir: str
    source_format: str = "parquet"
    schema: T.StructType | None = None
    max_files_per_trigger: int | None = None

    def read_stream(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream
        if self.schema is not None:
            reader = reader.schema(self.schema)
        if self.max_files_per_trigger:
            reader = reader.option(
                "maxFilesPerTrigger", str(self.max_files_per_trigger)
            )
        if self.source_format == "parquet":
            return reader.parquet(self.source_dir)
        if self.source_format == "json":
            return reader.json(self.source_dir)
        raise ValueError(f"unsupported source format {self.source_format!r}")


def default_rate_envelope(n_docs: int = 100) -> Callable[[DataFrame], DataFrame]:
    """Map rate-source (timestamp, value) rows to CDC envelopes. Pure
    function of ``value`` (the offset), so a replayed offset range yields
    the identical batch — the property exactly-once resume relies on."""

    def project(df: DataFrame) -> DataFrame:
        v = F.col("value")
        return df.select(
            v.alias("seq"),
            F.when(v % 10 == 0, F.lit("d"))
            .when(v % 3 == 0, F.lit("i"))
            .otherwise(F.lit("u"))
            .alias("op"),
            F.concat(F.lit("doc"), (v % n_docs).cast("string")).alias("doc_id"),
            F.array((v % 97).cast("int"), (v % 31).cast("int")).alias("tokens"),
            F.lit("rate").alias("source"),
        )

    return project


@dataclass
class RateSource(StreamSource):
    """Offset-ordered synthetic source: Spark's ``rate`` format projected
    to envelopes. ``rows_per_second`` bounds ingest; ``project`` must be a
    deterministic function of the offset column ``value``."""

    rows_per_second: int = 1000
    num_partitions: int | None = None
    project: Callable[[DataFrame], DataFrame] | None = None

    def read_stream(self, spark: SparkSession) -> DataFrame:
        reader = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(self.rows_per_second))
        )
        if self.num_partitions:
            reader = reader.option("numPartitions", str(self.num_partitions))
        df = reader.load()
        proj = self.project or default_rate_envelope()
        return proj(df)


@dataclass
class KafkaSource(StreamSource):
    """Standard Kafka reader config (production seam; needs the
    spark-sql-kafka package on the cluster). ``parse`` projects the raw
    (key binary, value binary, topic, partition, offset, timestamp) rows
    into envelopes — e.g. ``from_json(col("value").cast("string"), ...)``
    plus a seq derived from (partition, offset)."""

    bootstrap_servers: str
    topic: str
    starting_offsets: str = "earliest"
    max_offsets_per_trigger: int | None = None
    extra_options: dict = field(default_factory=dict)
    parse: Callable[[DataFrame], DataFrame] | None = None

    def options(self) -> dict:
        opts = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "subscribe": self.topic,
            "startingOffsets": self.starting_offsets,
        }
        if self.max_offsets_per_trigger:
            opts["maxOffsetsPerTrigger"] = str(self.max_offsets_per_trigger)
        opts.update(self.extra_options)
        return opts

    def read_stream(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream.format("kafka")
        for k, v in self.options().items():
            reader = reader.option(k, v)
        df = reader.load()
        return self.parse(df) if self.parse is not None else df
