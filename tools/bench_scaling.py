"""Two-cluster-size scaling benchmark (BASELINE.json north_rule evidence).

A real cluster is unavailable in the sandbox, so the rule's N vs 4N
executors criterion is evidenced by running the SAME replay job at
local[8] and local[32] on IDENTICAL pre-written input, in separate JVMs.
Prints one JSON line with both throughputs and the scaling efficiency
(thr_4N / thr_N / 4). Results are recorded in BASELINE.md.

Scratch space (input log, lake tables, shuffle dirs) lives on tmpfs
(JITSU_SCALE_DIR, default /dev/shm/jitsu_scale): the sandbox has ONE
virtual disk, which would bottleneck both runs identically and hide the
compute/shuffle scaling the rule is about — a real cluster has per-node
disks whose aggregate bandwidth scales with executor count.

Usage: python tools/bench_scaling.py [n_events] [n_low] [n_high]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from jitsu_spark.changelog import changelog_df
    from jitsu_spark.session import get_spark

    scratch = os.environ.get("JITSU_SCALE_DIR", "/dev/shm/jitsu_scale")
    os.makedirs(scratch, exist_ok=True)
    work = tempfile.mkdtemp(prefix="jitsu_scaling_input_", dir=scratch)
    log_dir = os.path.join(work, "log")
    spark = get_spark(app_name="scaling-gen", cores=n_high)
    spark.sparkContext.setLogLevel("ERROR")
    changelog_df(
        spark, n_events, n_events // 10, seed=42, hot_key_pct=0.1, dup_pct=0.01
    ).write.parquet(log_dir)
    spark.stop()

    results = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for cpus in (n_low, n_high):
        out = subprocess.run(
            [sys.executable, os.path.join(here, "replay_job.py"), log_dir, str(cpus)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    import shutil as _sh
    _sh.rmtree(work, ignore_errors=True)

    assert results[n_low]["final_rows"] == results[n_high]["final_rows"], (
        "final state must be identical across parallelism levels"
    )
    thr_low = results[n_low]["events_per_sec"]
    thr_high = results[n_high]["events_per_sec"]
    ratio = n_high / n_low
    efficiency = (thr_high / thr_low) / ratio
    print(
        json.dumps(
            {
                "n_events": n_events,
                f"throughput_local{n_low}": thr_low,
                f"throughput_local{n_high}": thr_high,
                f"secs_local{n_low}": results[n_low]["secs"],
                f"secs_local{n_high}": results[n_high]["secs"],
                "speedup": round(thr_high / thr_low, 3),
                "core_ratio": ratio,
                "scaling_efficiency": round(efficiency, 3),
                "final_rows": results[n_high]["final_rows"],
            }
        )
    )


if __name__ == "__main__":
    main()
