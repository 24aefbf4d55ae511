"""Event-time windowed rollup with watermarking (A4's streaming variant +
explicit ST1 late-data policy).

The reference re-aggregates counters by day/hour on the READ path from
Redis (meta/redis.go:630-720 semantics) and has no watermarks at all; the
Spark-first version is a real streaming stateful aggregation: tumbling
event-time windows over the change log, state bounded by a watermark,
late events beyond the watermark DROPPED (the policy is explicit, not
accidental). Append output mode emits a window exactly once, when the
watermark passes its end — the metrics analog of exactly-once.

State sizing at scale: (#open windows x #groups) rows of fixed width —
watermark delay bounds #open windows, so state is O(groups), independent
of events. Partial aggregation applies before the shuffle, so hot windows
behave like hot keys in the LWW reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def windowed_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "source",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """The rollup transformation (works on batch AND streaming frames;
    the watermark only takes effect on streams)."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("n_tok").alias("sum_tok"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            group_col,
            "n_events",
            "sum_tok",
        )
    )


def run_rollup_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema: T.StructType,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    group_col: str = "source",
    window: str = "1 hour",
    watermark: str = "2 hours",
    timeout_s: int = 300,
) -> None:
    """Tail the change-log directory, emit finalized windows to a parquet
    sink (append mode: one emission per window, after the watermark passes
    its end). availableNow drains the backlog and stops; windows still
    open at the final watermark stay in checkpointed state for the next
    run — nothing is emitted twice or early."""
    df = spark.readStream.schema(source_schema).parquet(source_dir)
    agg = windowed_rollup(df, ts_col, group_col, window, watermark)
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_s)
    finally:
        if q.isActive:
            q.stop()
    if q.exception() is not None:
        raise q.exception()
