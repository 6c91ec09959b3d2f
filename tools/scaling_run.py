"""One-shot N→4N scaling evidence run (north rule: ≥0.8 efficiency
from N to 4N executors, evidenced at two local[·] parallelism levels).

Runs, in order: host calibration (python-multiprocessing sha256 —
separate processes, zero shared heap, the pure-CPU ceiling of the VM),
bench.py replay at local[4] and local[16] (fresh JVM each, 8M events,
3 measured reps after warm-up, query loop skipped), calibration again.
Prints one JSON line.

Usage: python tools/scaling_run.py [n_events]
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
# N and 4N parallelism levels (north rule allows any N; default 4->16).
# On a co-tenant-loaded host a smaller footprint (2->8) fits the idle
# capacity and measures the engine, not the neighbors.
N_LOW = int(sys.argv[2]) if len(sys.argv) > 2 else 4
N_HIGH = 4 * N_LOW
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sha_work(n: int) -> bytes:
    h = hashlib.sha256()
    chunk = b"x" * 64
    for _ in range(n):
        h.update(chunk)
    return h.digest()


def calibrate(workers: int, total: int = 60_000_000) -> float:
    """Wall seconds for a fixed sha256 workload split over N processes."""
    with mp.Pool(workers) as pool:
        t0 = time.time()
        pool.map(_sha_work, [total // workers] * workers)
        return round(time.time() - t0, 3)


def bench(cpus: int) -> dict:
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": str(cpus),
        "BENCH_EVENTS": str(N_EVENTS),
        "BENCH_QUERIES": "__replay_only__",  # matches nothing -> skip query loop
        "BENCH_REPLAY_RUNS": "3",
        # keep the real per-query sidecar (BENCH/queries_latest.json)
        # intact — a replay-only scaling leg has no query timings
        "BENCH_QUERIES_FILE": os.path.join(
            "/tmp", f"scaling_queries_{cpus}.json"
        ),
    }
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=1800, cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    return {
        "cpus": cpus,
        "events_per_sec": d["events_per_sec"],
        "replay_runs_sec": d.get("replay_runs_sec"),
    }


def main() -> None:
    cal_pre = {w: calibrate(w) for w in (N_LOW, N_HIGH)}
    b4 = bench(N_LOW)
    b16 = bench(N_HIGH)
    cal_post = {w: calibrate(w) for w in (N_LOW, N_HIGH)}

    raw = b16["events_per_sec"] / (4 * b4["events_per_sec"])
    cal_eff = min(
        cal_pre[N_LOW] / cal_pre[N_HIGH] / 4.0,
        cal_post[N_LOW] / cal_post[N_HIGH] / 4.0,
    )
    best_cal = max(
        cal_pre[N_LOW] / cal_pre[N_HIGH] / 4.0,
        cal_post[N_LOW] / cal_post[N_HIGH] / 4.0,
    )
    print(
        json.dumps(
            {
                "n_events": N_EVENTS,
                f"local{N_LOW}": b4,
                f"local{N_HIGH}": b16,
                "raw_efficiency_N_to_4N": round(raw, 3),
                "host_cal_sec_pre": cal_pre,
                "host_cal_sec_post": cal_post,
                "host_ceiling_N_to_4N": [round(cal_eff, 3), round(best_cal, 3)],
                "normalized_efficiency": round(raw / best_cal, 3)
                if best_cal
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
