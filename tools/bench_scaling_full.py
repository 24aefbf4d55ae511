"""Full scaling-evidence run (BASELINE.md): CDC replay at local[2] /
local[8] / local[32] interleaved over several repetitions (the sandbox is
a shared VM whose effective CPU fluctuates minute-to-minute — interleaved
best-of-reps is the only stable protocol), plus a pure-CPU Spark control
measuring the hardware's own thread-scaling ceiling in the same window.

Prints one JSON line. Expect ~30 min.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPU_CONTROL = '''
import sys, time
sys.path.insert(0, "/root/repo")
from jitsu_spark.session import get_spark
from pyspark.sql import functions as F
cpus = int(sys.argv[1])
spark = get_spark(cores=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(0, 400_000_000, 1, cpus*4)
expr = F.col("id")
for i in range(8):
    expr = F.xxhash64(expr, F.lit(i))
best = None
for it in range(3):
    t0=time.time()
    df.select(expr.alias("h")).filter(F.col("h") % 2 == 0).agg(F.count("h")).collect()
    s = time.time()-t0
    best = s if best is None or s < best else best
print("SECS", round(best, 2))
spark.stop()
'''


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    levels = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["2", "8", "32"])]
    n_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from jitsu_spark.changelog import changelog_df
    from jitsu_spark.session import get_spark

    scratch = os.environ.get("JITSU_SCALE_DIR", "/dev/shm/jitsu_scale")
    os.makedirs(scratch, exist_ok=True)
    work = tempfile.mkdtemp(prefix="jitsu_scaling_full_", dir=scratch)
    log_dir = os.path.join(work, "log")
    spark = get_spark(app_name="scaling-gen", cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    changelog_df(
        spark, n_events, n_events // 10, seed=42, hot_key_pct=0.1, dup_pct=0.01,
        max_tokens=int(os.environ.get("JITSU_SCALE_MAX_TOKENS", "64")),
        long_tail_pct=float(os.environ.get("JITSU_SCALE_LONGTAIL", "0.05")),
        n_partitions=256,  # a real 10^10 tail is thousands of files; a
        # handful of fat partitions would cap scan parallelism at ~8 tasks
    ).write.parquet(log_dir)
    spark.stop()

    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ, JITSU_SCALE_ITERS="3")
    best: dict[int, dict] = {}
    for rep in range(n_reps):
        for cpus in levels:
            out = subprocess.run(
                [sys.executable, os.path.join(here, "replay_job.py"), log_dir, str(cpus)],
                capture_output=True, text=True, env=env,
            )
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not lines:
                print(f"rep{rep} local[{cpus}] FAILED", file=sys.stderr)
                continue
            r = json.loads(lines[-1])
            print(f"rep{rep} local[{cpus}]: {r['secs']}s", file=sys.stderr)
            if cpus not in best or r["secs"] < best[cpus]["secs"]:
                best[cpus] = r

    # pure-CPU hardware control, same window
    control: dict[int, float] = {}
    for cpus in levels:
        out = subprocess.run(
            [sys.executable, "-c", CPU_CONTROL, str(cpus)],
            capture_output=True, text=True,
        )
        secs = [l for l in out.stdout.splitlines() if l.startswith("SECS")]
        if secs:
            control[cpus] = float(secs[0].split()[1])

    import shutil
    shutil.rmtree(work, ignore_errors=True)

    result: dict = {"n_events": n_events, "levels": levels}
    for c in levels:
        if c in best:
            result[f"cdc_secs_local{c}"] = best[c]["secs"]
            result[f"cdc_events_per_sec_local{c}"] = best[c]["events_per_sec"]
        if c in control:
            result[f"cpu_control_secs_local{c}"] = control[c]
    lo, hi = levels[0], levels[-1]
    for a, b in [(lo, hi)] + ([(levels[0], levels[1]), (levels[1], levels[2])] if len(levels) == 3 else []):
        if a in best and b in best:
            sp = best[a]["secs"] / best[b]["secs"]
            result[f"cdc_eff_{a}to{b}"] = round(sp / (b / a), 3)
        if a in control and b in control:
            sp = control[a] / control[b]
            result[f"cpu_eff_{a}to{b}"] = round(sp / (b / a), 3)
    fr = {best[c]["final_rows"] for c in best}
    result["final_rows_identical"] = len(fr) == 1
    print(json.dumps(result))


if __name__ == "__main__":
    main()
