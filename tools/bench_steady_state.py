"""Steady-state CDC regime benchmark: a SMALL micro-batch applied to a
BIG table — the shape of the 10^10-event tail, where batches are a tiny
fraction of table size. This is where CoW (rewrite every affected
bucket) and MoR (append one delta per affected bucket) diverge by
construction; BASELINE.md records the measured gap.

Builds an N-row table once per mode, then applies K consecutive small
batches (hot keys spread over all buckets — the worst case for CoW,
since every bucket is affected) and reports per-batch seconds + ev/s.

Usage: python tools/bench_steady_state.py [table_rows] [batch_rows] [n_batches] [cpus]
       (defaults: 4000000 20000 4 8)  — one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T


def main() -> None:
    table_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    from jitsu_spark.changelog import changelog_df
    from jitsu_spark.lake import LakeTable
    from jitsu_spark.lake.merge import merge_batch
    from jitsu_spark.session import get_spark

    scratch = os.environ.get("JITSU_SCALE_DIR", "/dev/shm/jitsu_scale")
    os.makedirs(scratch, exist_ok=True)
    work = tempfile.mkdtemp(prefix="jitsu_steady_", dir=scratch)
    spark = get_spark(
        app_name="steady", cores=cpus, shuffle_partitions=cpus,
        extra_conf={"spark.local.dir": os.path.join(work, "sl")},
    )
    spark.sparkContext.setLogLevel("ERROR")

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    # one big seed log + K small update batches over the same key space
    seed_log = changelog_df(
        spark, table_rows, table_rows, seed=7, p_delete=0.0, p_update=0.0,
        hot_key_pct=0.0, n_partitions=128,
    )
    seed_dir = os.path.join(work, "seed")
    seed_log.write.parquet(seed_dir)
    seed = spark.read.parquet(seed_dir)

    results: dict = {
        "table_rows": table_rows, "batch_rows": batch_rows,
        "n_batches": n_batches, "cpus": cpus,
    }
    for mode in ("cow", "mor"):
        t = LakeTable.create(
            spark, os.path.join(work, f"tbl_{mode}"), schema, "doc_id",
            n_buckets=64, properties={"write.mode": mode},
        )
        merge_batch(t, seed, batch_id="seed", job_id=f"st-{mode}")
        secs = []
        for i in range(n_batches):
            upd = changelog_df(
                spark, batch_rows, table_rows, seed=100 + i, p_delete=0.05,
                p_update=0.95, hot_key_pct=0.0, n_partitions=8,
            ).withColumn("seq", F.col("seq") + (i + 1) * table_rows)
            upd.write.parquet(os.path.join(work, f"b{mode}{i}"))
            upd = spark.read.parquet(os.path.join(work, f"b{mode}{i}"))
            t0 = time.time()
            merge_batch(t, upd, batch_id=i, job_id=f"st-{mode}")
            secs.append(round(time.time() - t0, 2))
        best = min(secs[1:]) if len(secs) > 1 else secs[0]
        results[f"{mode}_batch_secs"] = secs
        results[f"{mode}_best_batch_s"] = best
        results[f"{mode}_events_per_sec"] = round(batch_rows / best, 1)

    results["mor_speedup_vs_cow"] = round(
        results["cow_best_batch_s"] / results["mor_best_batch_s"], 2
    )
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
