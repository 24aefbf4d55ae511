"""One CDC replay run for the scaling benchmark: read a pre-written change
log (identical input across runs), replay through the engine, print JSON.

Usage: python tools/replay_job.py <log_dir> <cpus> [n_batches] [n_buckets]
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
    log_dir = sys.argv[1]
    cpus = int(sys.argv[2])
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    from jitsu_spark.lake import LakeTable
    from jitsu_spark.lake.merge import merge_batch
    from jitsu_spark.session import get_spark

    scratch = os.environ.get("JITSU_SCALE_DIR", "/dev/shm/jitsu_scale")
    os.makedirs(scratch, exist_ok=True)
    spark = get_spark(
        app_name=f"scaling-{cpus}", cores=cpus, shuffle_partitions=cpus,
        extra_conf={
            "spark.local.dir": os.path.join(scratch, f"spark-local-{cpus}"),
            # per-batch seq-range scans must still fan out across all
            # cores: small input splits keep map parallelism >= cores even
            # when predicate pushdown prunes most of the log
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    log = spark.read.parquet(log_dir)
    n_events = log.count()
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    work = tempfile.mkdtemp(prefix=f"jitsu_scale_{cpus}_", dir=scratch)
    try:
        # several full iterations into fresh tables; iteration 0 warms
        # JIT/codegen (a constant that vanishes against a 10^10-event
        # tail); the reported time is the MIN of the remaining iterations
        # (the host is a shared VM with heavy run-to-run interference —
        # min is the least-contended, most hardware-faithful sample)
        n_iters = int(os.environ.get("JITSU_SCALE_ITERS", "4"))
        per = n_events // n_batches + 1
        iter_secs = []
        n_final = 0
        for it in range(n_iters):
            table = LakeTable.create(
                spark, os.path.join(work, f"tbl_{it}"), schema, "doc_id",
                n_buckets=n_buckets,
                properties={"write.mode": os.environ.get("JITSU_WRITE_MODE", "cow")},
            )
            t0 = time.time()
            for i in range(n_batches):
                part = log.filter(
                    (F.col("seq") >= i * per) & (F.col("seq") < (i + 1) * per)
                )
                merge_batch(table, part, batch_id=i, job_id=f"it{it}")
            if os.environ.get("JITSU_MOR_COMPACT_EVERY"):
                table.compact(
                    max_files_per_bucket=int(os.environ["JITSU_MOR_COMPACT_EVERY"])
                )
            iter_secs.append(time.time() - t0)
            n_final = table.read().count()
            shutil.rmtree(os.path.join(work, f"tbl_{it}"), ignore_errors=True)
        secs = min(iter_secs[1:]) if len(iter_secs) > 1 else iter_secs[0]
        print(json.dumps({"iter_secs": [round(x, 2) for x in iter_secs]}),
              file=sys.stderr)
        print(
            json.dumps(
                {
                    "cpus": cpus,
                    "n_events": n_events,
                    "secs": round(secs, 2),
                    "events_per_sec": round(n_events / secs, 1),
                    "final_rows": n_final,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
