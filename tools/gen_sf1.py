"""Generate an sf1-equivalent test dataset (10x sf0.1) into a scratch dir.

No native sf1 parquet ships with the sandbox and /root/testdata is
read-only, so the 100x-the-gate correctness pass (COVERAGE.md) inflates
sf0.1 deterministically — the same replica scheme bench.py uses:

- fact tables (events/lineitem/orders/documents/embeddings) are
  cross-joined with a replica index; id columns shift by 10M per replica
  (uniqueness preserved), texts mutate per replica (LSH bucket structure
  stays realistic), embeddings perturb per replica;
- dimension tables copy as-is, so joins get 10x fan-in.

Usage: python tools/gen_sf1.py [out_dir] [scale]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F


def inflate(spark, sf_dir: str, out_dir: str, scale: int) -> None:
    rep = spark.range(scale).select(F.col("id").alias("_rep"))
    shift = F.col("_rep") * 10_000_000

    def one(table: str, remap: set, mutate: dict | None = None):
        src = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
        out = src.crossJoin(rep)
        for c in src.columns:
            if c in remap:
                out = out.withColumn(c, F.col(c) + shift)
            elif mutate and c in mutate:
                out = out.withColumn(c, mutate[c])
        out.select(*src.columns).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )

    one("events", {"event_id"})
    one("lineitem", {"l_orderkey"})
    one("orders", {"o_orderkey"})
    one(
        "documents", {"doc_id"},
        {"text": F.when(F.col("_rep") == 0, F.col("text")).otherwise(
            F.concat(F.col("text"), F.lit(" r"), F.col("_rep"))
        )},
    )
    one(
        "embeddings", {"vec_id"},
        {"embedding": F.transform(
            "embedding",
            lambda x: x + (F.col("_rep") % 7).cast("float") * 0.003,
        )},
    )
    for dim in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(
            os.path.join(sf_dir, f"{dim}.parquet")
        ).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{dim}.parquet")
        )


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/jitsu_sf1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from jitsu_spark.session import get_spark

    spark = get_spark(app_name="gen-sf1", cores=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    inflate(spark, "/root/testdata/sf0.1", out_dir, scale)
    print(f"wrote sf1-equivalent ({scale}x sf0.1) to {out_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
