"""Wire-segment publisher (sinks/publish): cursor-windowed Debezium
segments on disk, exactly-once under crash/replay, consumable back
through the wire parser to the source's exact state."""

import json
import os
import shutil

from pyspark.sql import functions as F

from embulk_util_json_spark.sinks.feed import FeedCursor
from embulk_util_json_spark.sinks.publish import publish_changes, published_segments
from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
from embulk_util_json_spark.sources.debezium import parse_debezium_events
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


def _state(df):
    return sorted((r.conv_id, r.turn_idx, r.text) for r in df.collect())


def _consume_all(spark, out_dir):
    """Re-ingest every published segment through the Debezium adapter
    and LWW-fold — the external consumer's contract."""
    segs = published_segments(out_dir)
    raw = spark.read.text(
        [os.path.join(out_dir, s["name"]) for s in segs]
    ).withColumn("seq", F.monotonically_increasing_id())
    parsed = parse_debezium_events(raw.select("seq", F.col("value").alias("event_json")))
    # per-segment net changes: later segment wins per key — order by
    # (ts, seq-within) is already embedded; fold with the engine's LWW
    from embulk_util_json_spark.operators.lww import lww_agg

    final = lww_agg(parsed, ["conv_id", "turn_idx"], ["ts", "seq"])
    return final.filter(F.col("op") != "delete")


def test_publish_segments_and_consume(spark, tmp_path):
    src = ParquetSnapshotSink(spark, str(tmp_path / "s"), num_buckets=2, mode="mor")
    out = str(tmp_path / "topic")
    batches = [
        [_ev(0, "insert", "a", 1, 1), _ev(1, "insert", "b", 1, 1)],
        [_ev(2, "update", "a", 1, 2, text="v2"), _ev(3, "delete", "b", 1, 3)],
        [_ev(4, "insert", "c", 1, 4)],
    ]
    for i, rows in enumerate(batches):
        apply_events_batch(_mk(spark, rows), src, f"b{i}")
        publish_changes(src, "exporter", out, wire="debezium")
    segs = published_segments(out)
    assert len(segs) == 3
    assert [s["from_version"] for s in segs] == [0, 1, 2]
    assert publish_changes(src, "exporter", out) is None, "caught up"
    got = _consume_all(spark, out)
    assert _state(got) == _state(src.read()) == [("a", 1, "v2"), ("c", 1, "t4")]


def test_publish_crash_between_segment_and_commit(spark, tmp_path):
    """Crash AFTER the segment landed but BEFORE the cursor committed:
    the next publish rewrites the same segment name with identical
    content and commits — no duplicate segment, no lost window."""
    src = ParquetSnapshotSink(spark, str(tmp_path / "s"), num_buckets=1, mode="mor")
    out = str(tmp_path / "topic")
    apply_events_batch(_mk(spark, [_ev(0, "insert", "a", 1, 1)]), src, "b0")
    publish_changes(src, "exporter", out)
    apply_events_batch(_mk(spark, [_ev(1, "insert", "b", 1, 2)]), src, "b1")
    publish_changes(src, "exporter", out)
    # simulate the crash: roll the cursor back to before the 2nd publish
    FeedCursor(src, "exporter").reset(1)
    r = publish_changes(src, "exporter", out)
    assert r["segment"] == "segment-00000001-00000002"
    assert len(published_segments(out)) == 2, "re-publish must not duplicate"
    assert _state(_consume_all(spark, out)) == _state(src.read())


def test_publish_native_and_unknown_wire(spark, tmp_path):
    import pytest

    src = ParquetSnapshotSink(spark, str(tmp_path / "s"), num_buckets=1, mode="mor")
    out = str(tmp_path / "topic")
    apply_events_batch(_mk(spark, [_ev(0, "insert", "a", 1, 1)]), src, "b0")
    r = publish_changes(src, "exporter", out, wire="native")
    assert r is not None
    seg = os.path.join(out, r["segment"])
    lines = [
        l for f in os.listdir(seg) if f.startswith("part-") and f.endswith(".txt")
        for l in open(os.path.join(seg, f))
    ]
    assert any('"op":"insert"' in l or '"op": "insert"' in l for l in lines)
    with pytest.raises(ValueError, match="unknown wire"):
        publish_changes(src, "exporter2", out, wire="avro")


def test_read_published_resumes_and_round_trips(spark, tmp_path):
    """read_published is the consumer library twin: full read folds to
    source state; from_version resumes mid-topic; applying segments to
    a second sink with segment-named batch ids mirrors via the wire."""
    from embulk_util_json_spark.operators.lww import lww_agg
    from embulk_util_json_spark.sinks.publish import read_published

    src = ParquetSnapshotSink(spark, str(tmp_path / "s"), num_buckets=1, mode="mor")
    out = str(tmp_path / "topic")
    batches = [
        [_ev(0, "insert", "a", 1, 1)],
        [_ev(1, "update", "a", 1, 2, text="v2"), _ev(2, "insert", "b", 1, 2)],
    ]
    for i, rows in enumerate(batches):
        apply_events_batch(_mk(spark, rows), src, f"b{i}")
        publish_changes(src, "exporter", out)
    all_changes = read_published(spark, out)
    folded = lww_agg(all_changes, ["conv_id", "turn_idx"], ["ts", "seq"])
    assert _state(folded.filter(F.col("op") != "delete")) == _state(src.read())
    # resume past the first segment: only the second window's keys
    tail = read_published(spark, out, from_version=1)
    assert {r.conv_id for r in tail.collect()} == {"a", "b"}
    assert read_published(spark, out, from_version=99) is None
    # wire-mirror: apply each segment to a second sink, exactly-once
    dst = ParquetSnapshotSink(spark, str(tmp_path / "d"), num_buckets=1, mode="mor")
    for s in published_segments(out):
        seg = read_published(spark, out, from_version=s["to_version"] - 1)
        seg = seg.filter(F.col("seq") == s["to_version"])
        dst.apply(seg, s["name"])
        assert dst.apply(seg, s["name"]).get("skipped")
    assert _state(dst.read()) == _state(src.read())


def test_streaming_on_batch_publishes_continuously(spark, tmp_path):
    """stream_directory(on_batch=...) keeps a wire topic exported after
    every epoch, surviving a checkpoint restart without duplicating or
    losing a window."""
    import pyarrow.parquet as pq

    from embulk_util_json_spark.sources.generator import generate_events

    events_table = generate_events(4000, n_convs=40, n_turns=30)

    from embulk_util_json_spark.operators.lww import lww_agg
    from embulk_util_json_spark.sinks.publish import read_published
    from embulk_util_json_spark.streaming.runner import stream_directory

    events_dir = tmp_path / "stream_in"
    events_dir.mkdir()
    n = events_table.num_rows
    pq.write_table(events_table.slice(0, n // 2), str(events_dir / "part-0.parquet"))
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=4)
    out = str(tmp_path / "topic")
    ckpt = str(tmp_path / "ckpt")
    hook = lambda s, bid: publish_changes(s, "bridge", out)  # noqa: E731
    q = stream_directory(spark, str(events_dir), sink, ckpt, on_batch=hook)
    q.awaitTermination()
    n_seg_1 = len(published_segments(out))
    assert n_seg_1 >= 1
    pq.write_table(events_table.slice(n // 2), str(events_dir / "part-1.parquet"))
    q2 = stream_directory(spark, str(events_dir), sink, ckpt, on_batch=hook)
    q2.awaitTermination()
    assert len(published_segments(out)) > n_seg_1
    ch = read_published(spark, out)
    fold = lww_agg(ch, ["conv_id", "turn_idx"], ["ts", "seq"]).filter(
        F.col("op") != "delete"
    )
    assert _state(fold) == _state(sink.read())


def test_compact_published_folds_and_preserves_consumers(spark, tmp_path):
    """Topic compaction: old segments fold into one net segment
    (tombstones preserved), newest windows untouched, consume-from-zero
    still equals source state, orphan dirs swept."""
    from embulk_util_json_spark.operators.lww import lww_agg
    from embulk_util_json_spark.sinks.publish import (
        compact_published,
        read_published,
    )

    src = ParquetSnapshotSink(spark, str(tmp_path / "s"), num_buckets=1, mode="mor")
    out = str(tmp_path / "topic")
    batches = [
        [_ev(0, "insert", "a", 1, 1), _ev(1, "insert", "b", 1, 1)],
        [_ev(2, "delete", "b", 1, 2)],
        [_ev(3, "update", "a", 1, 3, text="v3")],
        [_ev(4, "insert", "c", 1, 4)],
    ]
    for i, rows in enumerate(batches):
        apply_events_batch(_mk(spark, rows), src, f"b{i}")
        publish_changes(src, "exporter", out)
    assert len(published_segments(out)) == 4
    m = compact_published(spark, out, keep_last=1)
    assert m["folded"] == 3 and m["removed_dirs"] == 3
    segs = published_segments(out)
    assert len(segs) == 2 and segs[0].get("compacted")
    assert segs[0]["from_version"] == 0 and segs[0]["to_version"] == 3
    # tombstone for 'b' must survive the fold for from-zero consumers
    folded_raw = read_published(spark, out)
    ops = {(r.conv_id, r.op) for r in folded_raw.collect()}
    assert ("b", "delete") in ops
    fold = lww_agg(folded_raw, ["conv_id", "turn_idx"], ["ts", "seq"]).filter(
        F.col("op") != "delete"
    )
    assert _state(fold) == _state(src.read()) == [("a", 1, "v3"), ("c", 1, "t4")]
    # nothing worth folding twice
    assert compact_published(spark, out, keep_last=1) is None
    # on-disk dirs match the manifest exactly
    dirs = {d for d in os.listdir(out) if d.startswith("segment-")}
    assert dirs == {s["name"] for s in segs}
