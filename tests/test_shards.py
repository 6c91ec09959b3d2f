"""Sharded-source merge (pipeline/shards.py): the grouped fence must
equal per-shard applications of the single-stream fence; one shard's
hole must not stall the others; the merge stamp must be injective and
order-preserving; end-to-end the sharded round-trip reproduces the
unsharded final state."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from embulk_util_json_spark.pipeline.disorder import fence_at_first_gap
from embulk_util_json_spark.pipeline.shards import (
    fence_per_shard,
    merge_shard_seqs,
    shard_fences,
)
from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
from embulk_util_json_spark.sources.generator import generate_events
from embulk_util_json_spark.streaming.runner import apply_events_batch

N = 3000
S = 3  # shards


@pytest.fixture(scope="module")
def ev_parquet(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("shards") / "events.parquet")
    pq.write_table(generate_events(N, n_convs=30, n_turns=20), path)
    return path


def _sharded(ev):
    """Decompose the event stream into S shard frames with dense
    per-shard seq spaces: shard = seq % S, shard_seq = seq div S."""
    return ev.select(
        (F.col("seq") % S).cast("int").alias("shard"),
        F.expr(f"seq div {S}").alias("seq"),
        "event_json",
    )


def test_merge_stamp_roundtrips(spark, ev_parquet):
    ev = spark.read.parquet(ev_parquet)
    merged = merge_shard_seqs(_sharded(ev), S)
    # global_seq = (seq div S)*S + seq%S == seq: exact round trip
    assert merged.select("seq", "event_json").exceptAll(
        ev.select("seq", "event_json")
    ).count() == 0
    assert ev.select("seq", "event_json").exceptAll(
        merged.select("seq", "event_json")
    ).count() == 0


def test_grouped_fence_equals_single_stream_per_shard(spark, ev_parquet):
    ev = _sharded(spark.read.parquet(ev_parquet))
    # punch a different hole in each shard
    holes = {0: (100, 120), 1: (400, 405), 2: (700, 790)}
    cond = None
    for sh, (lo, hi) in holes.items():
        c = (F.col("shard") == sh) & (F.col("seq") >= lo) & (F.col("seq") < hi)
        cond = c if cond is None else (cond | c)
    gapped = ev.filter(~cond)

    fenced = fence_per_shard(gapped, "shard", "seq")
    for sh in range(S):
        solo = fence_at_first_gap(gapped.filter(F.col("shard") == sh), "seq")
        got = sorted(
            r.seq for r in fenced.filter(F.col("shard") == sh).collect()
        )
        want = sorted(r.seq for r in solo.collect())
        assert got == want, f"shard {sh}"


def test_one_shard_hole_does_not_stall_others(spark, ev_parquet):
    ev = _sharded(spark.read.parquet(ev_parquet))
    gapped = ev.filter(
        ~((F.col("shard") == 1) & (F.col("seq") >= 200) & (F.col("seq") < 220))
    )
    fences = {r.shard: r.fence for r in shard_fences(gapped).collect()}
    assert fences[1] == 200
    assert fences[0] > N // S - 2 and fences[2] > N // S - 2
    fenced = fence_per_shard(gapped)
    # shards 0/2 keep their full span including seqs past shard 1's hole
    assert fenced.filter(
        (F.col("shard") == 0) & (F.col("seq") > 220)
    ).count() > 0


def test_sharded_roundtrip_final_state_equals_unsharded(spark, ev_parquet, tmp_path):
    ev = spark.read.parquet(ev_parquet)
    merged = merge_shard_seqs(_sharded(ev), S).drop("shard")

    a = ParquetSnapshotSink(spark, str(tmp_path / "a"), num_buckets=4)
    apply_events_batch(ev, a, "all")
    b = ParquetSnapshotSink(spark, str(tmp_path / "b"), num_buckets=4)
    apply_events_batch(merged, b, "all")

    sa = sorted(map(tuple, a.read().collect()))
    sb = sorted(map(tuple, b.read().collect()))
    assert sa == sb


def test_no_unpartitioned_window_in_fence_plan(spark, ev_parquet):
    ev = _sharded(spark.read.parquet(ev_parquet))
    plan = shard_fences(ev)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "shard" in line and "_rid" in line, line


def test_empty_input(spark):
    df = spark.createDataFrame([], "shard int, seq long, event_json string")
    assert shard_fences(df).count() == 0
    assert fence_per_shard(df).count() == 0
