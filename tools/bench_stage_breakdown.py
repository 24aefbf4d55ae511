"""Per-stage scaling accounting (BASELINE.md evidence): decompose the CDC
replay into its pipeline stages and measure each stage's wall time at two
(or more) parallelism levels over the SAME pre-generated log, so the
N->4N efficiency loss can be attributed stage by stage.

Stages (mirroring merge_batch's plan):
  scan_decode   parquet scan + full payload decode (tokens included)
  stats_pass    keys-only bucket stats aggregate (the pre-merge pass)
  lww_shuffle   groupBy(key).agg(max_by(payload, seq)) -> noop sink
  anti_join     bucket scan LEFT ANTI broadcast keys -> noop sink
  write         LWW output repartition(n_buckets) -> parquet encode (tmpfs)
  pure_cpu      xxhash chain, no IO/shuffle (hardware ceiling control)

Each stage runs ITERS times per level in one JVM; the minimum is reported
(shared-VM protocol, see BASELINE.md). One JSON line at the end.

Usage: python tools/bench_stage_breakdown.py [n_events] [levels] [iters]
       (defaults: 4000000 2,8 3)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE_JOB = '''
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from jitsu_spark.session import get_spark
from pyspark.sql import functions as F

log_dir, cpus, iters = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
scratch = os.path.dirname(log_dir)
spark = get_spark(
    app_name=f"stages-{cpus}", cores=cpus, shuffle_partitions=cpus,
    extra_conf={
        "spark.local.dir": os.path.join(scratch, f"spark-local-st{cpus}"),
        "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
    },
)
spark.sparkContext.setLogLevel("ERROR")
log = spark.read.parquet(log_dir)
N_BUCKETS = 64
bucket = F.pmod(F.xxhash64("doc_id"), F.lit(N_BUCKETS)).cast("int")

winner = F.max_by(
    F.struct("tokens", "n_tok", "source", "ts", F.col("op").alias("_op")),
    F.col("seq"),
).alias("_w")
lww = log.groupBy("doc_id").agg(winner).select("doc_id", "_w.*")

# a materialized "existing table" side for the anti-join + a key set
table_dir = os.path.join(scratch, f"tbl-side-{cpus}")
if not os.path.isdir(table_dir):
    (lww.filter(F.col("_op") != "d").drop("_op")
        .withColumn("_jb", bucket)
        .repartition(N_BUCKETS, F.col("_jb"))
        .write.mode("overwrite").parquet(table_dir))
existing = spark.read.parquet(table_dir)
keys = lww.select("doc_id")

def noop(df):
    df.write.format("noop").mode("overwrite").save()

stages = {
    "scan_decode": lambda: log.select(
        F.sum(F.size("tokens")), F.sum("n_tok"), F.count("seq")
    ).collect(),
    "stats_pass": lambda: log.groupBy(bucket.alias("_jb")).agg(
        F.count(F.lit(1)), F.sum((F.col("op") == "d").cast("long")),
        F.min("seq"), F.max("seq"),
    ).collect(),
    "lww_shuffle": lambda: noop(lww),
    "anti_join": lambda: noop(
        existing.join(F.broadcast(keys), on="doc_id", how="left_anti")
    ),
    "write": lambda: (
        lww.filter(F.col("_op") != "d").drop("_op")
        .withColumn("_jb", bucket)
        .repartition(N_BUCKETS, F.col("_jb"))
        .write.mode("overwrite")
        .parquet(os.path.join(scratch, f"wout-{cpus}"))
    ),
}

cpu_expr = F.col("id")
for i in range(8):
    cpu_expr = F.xxhash64(cpu_expr, F.lit(i))
cpu_df = spark.range(0, 100_000_000, 1, cpus * 4)
stages["pure_cpu"] = lambda: cpu_df.select(cpu_expr.alias("h")).filter(
    F.col("h") % 2 == 0
).agg(F.count("h")).collect()

out = {}
for name, fn in stages.items():
    fn()  # warm JIT/codegen per stage
    best = None
    for _ in range(iters):
        t0 = time.time()
        fn()
        s = time.time() - t0
        best = s if best is None or s < best else best
    out[name] = round(best, 2)
print("STAGES " + json.dumps({"cpus": cpus, **out}))
spark.stop()
'''


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    levels = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["2", "8"])]
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from jitsu_spark.changelog import changelog_df
    from jitsu_spark.session import get_spark

    scratch = os.environ.get("JITSU_SCALE_DIR", "/dev/shm/jitsu_scale")
    os.makedirs(scratch, exist_ok=True)
    work = tempfile.mkdtemp(prefix="jitsu_stages_", dir=scratch)
    log_dir = os.path.join(work, "log")
    spark = get_spark(app_name="stages-gen", cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    changelog_df(
        spark, n_events, n_events // 10, seed=42, hot_key_pct=0.1,
        dup_pct=0.01, n_partitions=256,
    ).write.parquet(log_dir)
    spark.stop()

    per_level: dict[int, dict] = {}
    for cpus in levels:
        out = subprocess.run(
            [sys.executable, "-c", STAGE_JOB, log_dir, str(cpus), str(iters)],
            capture_output=True, text=True,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("STAGES ")]
        if not lines:
            print(f"local[{cpus}] FAILED:\n{out.stderr[-2000:]}", file=sys.stderr)
            continue
        per_level[cpus] = json.loads(lines[-1][len("STAGES "):])
        print(f"local[{cpus}]: {per_level[cpus]}", file=sys.stderr)

    import shutil

    shutil.rmtree(work, ignore_errors=True)

    result: dict = {"n_events": n_events, "levels": levels, "stages": per_level}
    if len(levels) >= 2:
        a, b = levels[0], levels[-1]
        if a in per_level and b in per_level:
            effs = {}
            for stage in per_level[a]:
                if stage == "cpus":
                    continue
                sa, sb = per_level[a][stage], per_level[b][stage]
                if sa and sb:
                    effs[stage] = round((sa / sb) / (b / a), 3)
            result[f"stage_eff_{a}to{b}"] = effs
    print(json.dumps(result))


if __name__ == "__main__":
    main()
