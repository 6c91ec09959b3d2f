"""Watermark-aligned cross-table reads (sinks/align): frontiers from
manifest ts zone maps, alignment at T = min of current frontiers, each
table served at its latest version whose frontier <= T."""

import pytest
from pyspark.sql import functions as F

from embulk_util_json_spark.sinks.align import (
    aligned_read,
    aligned_versions,
    event_time_frontier,
)
from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
from embulk_util_json_spark.streaming.runner import apply_events_batch


def _ev(seq, op, conv, turn, day, text=None):
    return (
        seq,
        f'{{"op":"{op}","ts":"2026-01-{day:02d} 00:00:00.000000",'
        f'"data":{{"conv_id":"{conv}","turn_idx":{turn},"role":"r",'
        f'"text":"{text or f"t{seq}"}","tool":"x"}}}}',
    )


def _mk(spark, rows):
    return spark.createDataFrame(rows, "seq long, event_json string")


def _us(day):
    import datetime as dt

    return int(
        dt.datetime(2026, 1, day, tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )


def test_frontier_and_alignment(spark, tmp_path):
    a = ParquetSnapshotSink(spark, str(tmp_path / "a"), num_buckets=1, mode="mor")
    b = ParquetSnapshotSink(spark, str(tmp_path / "b"), num_buckets=1, mode="mor")
    apply_events_batch(_mk(spark, [_ev(0, "insert", "x", 1, 5)]), a, "a0")
    v_a1 = a.current_version()
    apply_events_batch(_mk(spark, [_ev(1, "insert", "y", 1, 20)]), a, "a1")
    apply_events_batch(_mk(spark, [_ev(2, "insert", "z", 1, 10)]), b, "b0")
    assert event_time_frontier(a) == _us(20)
    assert event_time_frontier(a, v_a1) == _us(5)
    assert event_time_frontier(b) == _us(10)
    # T = min(20th, 10th) = 10th → a rolls back to its day-5 version
    versions, t = aligned_versions({"a": a, "b": b})
    assert t == _us(10)
    assert versions["a"] == v_a1 and versions["b"] == b.current_version()
    frames = aligned_read({"a": a, "b": b})
    assert [r.conv_id for r in frames["a"].collect()] == ["x"]
    assert [r.conv_id for r in frames["b"].collect()] == ["z"]
    for f in frames.values():
        mx = f.agg(F.max(F.unix_micros("ts")).alias("m")).collect()[0].m
        assert mx is None or mx <= t, "no table may serve rows beyond T"


def test_empty_table_means_no_watermark(spark, tmp_path):
    a = ParquetSnapshotSink(spark, str(tmp_path / "a"), num_buckets=1, mode="mor")
    b = ParquetSnapshotSink(spark, str(tmp_path / "b"), num_buckets=1, mode="mor")
    apply_events_batch(_mk(spark, [_ev(0, "insert", "x", 1, 5)]), a, "a0")
    versions, t = aligned_versions({"a": a, "b": b})
    assert t is None and versions == {"a": 0, "b": 0}
    frames = aligned_read({"a": a, "b": b})
    assert frames["a"].count() == 0 and frames["b"].count() == 0


def test_alignment_rolls_through_compaction_versions(spark, tmp_path):
    """Maintenance commits (compaction) between applies must not
    confuse the walk — the frontier of a compacted version equals the
    frontier of the state it compacted."""
    a = ParquetSnapshotSink(spark, str(tmp_path / "a"), num_buckets=1, mode="mor")
    b = ParquetSnapshotSink(spark, str(tmp_path / "b"), num_buckets=1, mode="mor")
    apply_events_batch(_mk(spark, [_ev(0, "insert", "x", 1, 5)]), a, "a0")
    a.compact(drop_tombstones=False)
    v_compacted = a.current_version()
    apply_events_batch(_mk(spark, [_ev(1, "insert", "y", 1, 20)]), a, "a1")
    apply_events_batch(_mk(spark, [_ev(2, "insert", "z", 1, 10)]), b, "b0")
    versions, t = aligned_versions({"a": a, "b": b})
    assert versions["a"] == v_compacted
    assert [r.conv_id for r in aligned_read({"a": a, "b": b})["a"].collect()] == ["x"]
