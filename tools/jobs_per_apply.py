"""Count Spark jobs per sink apply / view refresh — the fixed
per-micro-batch floor the round-5 apply-path work targets.

Job COUNTS are deterministic (independent of host load), so this is
runnable in any window. Each phase of the `cdc_join_view_incremental`
scenario (the worst measured floor query: 5 interleaved applies on two
sinks + 6 join-view refreshes) runs under its own job group; job IDs
are counted per group via the status tracker.

Usage: python tools/jobs_per_apply.py [sf_dir] [cpus]
Prints one JSON line: total jobs, per-phase counts, wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("jobs-per-apply")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.ui.retainedJobs", "100000")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    from embulk_util_json_spark.pipeline.join_view import IncrementalJoinView
    from embulk_util_json_spark.registry.common import _events_as_cdc_json
    from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
    from embulk_util_json_spark.sources.events import parse_change_events
    from embulk_util_json_spark.streaming.runner import apply_events_batch

    work = tempfile.mkdtemp(prefix="jobs_per_apply_")
    phases: list[tuple[str, int]] = []

    def run(name: str, fn) -> None:
        sc.setJobGroup(name, name)
        try:
            fn()
        finally:
            sc.setJobGroup("", "")
        phases.append((name, len(tracker.getJobIdsForGroup(name))))

    ev = _events_as_cdc_json(spark, SF_DIR)
    bounds = ev.agg(
        F.min("seq").alias("lo"), F.max("seq").alias("hi")
    ).collect()[0]
    lo, hi = int(bounds.lo), int(bounds.hi)
    span = hi - lo + 1
    prof = parse_change_events(ev).select(
        "conv_id", F.col("tool").alias("plan"), "op", "ts", "seq"
    )
    left = ParquetSnapshotSink(
        spark, os.path.join(work, "l"), num_buckets=8, mode="mor"
    )
    right = ParquetSnapshotSink(
        spark, os.path.join(work, "r"), num_buckets=8,
        keys=["conv_id"], order_cols=["ts", "seq"], mode="mor",
    )
    jv = IncrementalJoinView(
        spark, os.path.join(work, "v"), left, right, ["conv_id"]
    )
    steps = [
        ("l", lo, lo + span // 3),
        ("r", lo, lo + span // 2),
        ("l", lo + span // 3, lo + (2 * span) // 3),
        ("r", lo + span // 2, hi + 1),
        ("l", lo + (2 * span) // 3, hi + 1),
    ]
    t0 = time.perf_counter()
    for i, (side, a, b) in enumerate(steps):
        cut = (F.col("seq") >= a) & (F.col("seq") < b)
        if side == "l":
            run(f"apply_l{i}",
                lambda c=cut, i=i: apply_events_batch(ev.filter(c), left, f"b{i}"))
        else:
            run(f"apply_r{i}",
                lambda c=cut, i=i: right.apply(prof.filter(c), f"rb{i}"))
        run(f"refresh{i}", lambda: jv.refresh())
    run("final_read", lambda: jv.read().count())
    wall = time.perf_counter() - t0

    applies = [n for name, n in phases if name.startswith("apply")]
    refreshes = [n for name, n in phases if name.startswith("refresh")]
    print(json.dumps({
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "jobs_total": sum(n for _, n in phases),
        "jobs_per_apply": applies,
        "jobs_per_refresh": refreshes,
        "phases": dict(phases),
        "wall_sec": round(wall, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
