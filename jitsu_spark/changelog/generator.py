"""Deterministic synthetic CDC change-log generator (FIXTURES.md §1).

Envelope: (seq long, op string[i|u|d], ts timestamp, doc_id string,
tokens array<int>, n_tok int, source string).

Every column is a pure function of ``seq`` through ``xxhash64`` — the
generator is fully columnar (spark.range + JVM expressions, zero Python in
the data path, zero driver materialization), so a 10^8-event log is
synthesized on demand without ever being stored. Determinism is per-row,
independent of partitioning, so the same (n_events, seed) always produces
the identical log — the property the oracle replay and the two-cluster-size
benchmark both rely on.

Knobs (FIXTURES.md): op mix, hot-key skew (top key receives ``hot_key_pct``
of all events — drives the skew-handling tests), duplicate-delivery
fraction (same seq re-emitted — exactly-once check), out-of-order ``ts``
(decoupled from seq; seq decides LWW).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)

VOCAB = 50257
_BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def _h(seed: int, *cols) -> Column:
    return F.xxhash64(*cols, F.lit(seed))


def _u(seed: int, *cols) -> Column:
    """Deterministic uniform [0,1) from a hash."""
    return F.pmod(_h(seed, *cols), F.lit(1_000_000)) / F.lit(1_000_000.0)


def changelog_df(
    spark: SparkSession,
    n_events: int,
    n_docs: int,
    seed: int = 42,
    p_delete: float = 0.1,
    p_update: float = 0.7,
    hot_key_pct: float = 0.2,
    dup_pct: float = 0.0,
    max_tokens: int = 64,
    long_tail_pct: float = 0.05,
    long_tail_max: int = 2048,
    n_partitions: int | None = None,
) -> DataFrame:
    base = spark.range(0, n_events, 1, n_partitions or spark.sparkContext.defaultParallelism)
    seq = F.col("id")

    u_op = _u(seed + 1, seq)
    op = (
        F.when(u_op < p_delete, F.lit("d"))
        .when(u_op < p_delete + p_update, F.lit("u"))
        .otherwise(F.lit("i"))
    )

    hot = _u(seed + 2, seq) < hot_key_pct
    idx = F.when(hot, F.lit(0)).otherwise(F.pmod(_h(seed + 3, seq), F.lit(n_docs)))
    doc_id = F.format_string("doc%09d", idx.cast("int"))

    long_tail = _u(seed + 6, seq) < long_tail_pct
    n_tok = (
        F.when(long_tail, F.pmod(_h(seed + 7, seq), F.lit(long_tail_max)) + 1)
        .otherwise(F.pmod(_h(seed + 8, seq), F.lit(max_tokens)) + 1)
    ).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda x: F.pmod(_h(seed + 9, seq, x), F.lit(VOCAB)).cast("int"),
    )

    # event time decoupled from seq (out-of-order wrt the offset order)
    ts = F.timestamp_seconds(
        F.lit(_BASE_EPOCH) + F.pmod(_h(seed + 10, seq), F.lit(86400 * 30))
    )
    source = F.format_string("src%d", F.pmod(_h(seed + 11, seq), F.lit(5)).cast("int"))

    is_del = op == "d"
    df = base.select(
        seq.alias("seq"),
        op.alias("op"),
        ts.alias("ts"),
        doc_id.alias("doc_id"),
        F.when(is_del, F.lit(None).cast(T.ArrayType(T.IntegerType())))
        .otherwise(tokens)
        .alias("tokens"),
        F.when(is_del, F.lit(None).cast("int")).otherwise(n_tok).alias("n_tok"),
        source.alias("source"),
    )
    if dup_pct > 0:
        dups = df.filter(_u(seed + 12, F.col("seq")) < dup_pct)
        df = df.unionAll(dups)
    return df


def evolving_phases(
    spark: SparkSession,
    n_events: int,
    n_docs: int,
    seed: int = 42,
    s1_frac: float = 0.33,
    s2_frac: float = 0.66,
    **kwargs,
) -> list[DataFrame]:
    """Three-phase log for schema-evolution tests (FIXTURES.md §3):

    - phase 0: base envelope;
    - phase 1 (seq >= S1): adds ``lang string`` and ``quality int``
      (-> engine must ADD COLUMN);
    - phase 2 (seq >= S2): ``quality`` arrives as double
      (INT64 ⊔ FLOAT64 = FLOAT64 widening) and ``published_at`` arrives as
      an ISO string castable to timestamp.
    """
    s1, s2 = int(n_events * s1_frac), int(n_events * s2_frac)
    full = changelog_df(spark, n_events, n_docs, seed=seed, **kwargs)
    p0 = full.filter(F.col("seq") < s1)
    p1 = (
        full.filter((F.col("seq") >= s1) & (F.col("seq") < s2))
        .withColumn(
            "lang",
            F.element_at(
                F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("zh")),
                (F.pmod(_h(seed + 20, F.col("seq")), F.lit(4)) + 1).cast("int"),
            ),
        )
        .withColumn(
            "quality", F.pmod(_h(seed + 21, F.col("seq")), F.lit(100)).cast("int")
        )
    )
    p2 = (
        full.filter(F.col("seq") >= s2)
        .withColumn(
            "lang",
            F.element_at(
                F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("zh")),
                (F.pmod(_h(seed + 20, F.col("seq")), F.lit(4)) + 1).cast("int"),
            ),
        )
        .withColumn(
            "quality",
            (F.pmod(_h(seed + 21, F.col("seq")), F.lit(10000)) / 100.0).cast("double"),
        )
        .withColumn(
            "published_at",
            F.date_format(
                F.timestamp_seconds(
                    F.lit(_BASE_EPOCH) + F.pmod(_h(seed + 22, F.col("seq")), F.lit(86400))
                ),
                "yyyy-MM-dd'T'HH:mm:ss'Z'",
            ),
        )
    )
    return [p0, p1, p2]
