"""Watermarked event-time windowed aggregation: append-mode windows
emit exactly once when finalized; late-within-watermark events count,
later-than-watermark events are dropped."""

import json

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from embulk_util_json_spark.sources.events import parse_change_events_single_pass
from embulk_util_json_spark.streaming.runner import EVENTS_SCHEMA
from embulk_util_json_spark.streaming.windowed import windowed_activity


def _ev(seq, ts, conv="c1", turn=0, op="insert"):
    return (
        seq,
        json.dumps(
            {
                "op": op,
                "ts": ts,
                "data": {
                    "conv_id": conv,
                    "turn_idx": turn,
                    "role": "user",
                    "text": f"t{seq}",
                    "tool": None,
                },
            }
        ),
    )


def _write(rows, path):
    seqs, js = zip(*rows)
    pq.write_table(
        pa.table({"seq": pa.array(seqs, pa.int64()), "event_json": pa.array(js)}),
        str(path),
    )


def test_windowed_activity_watermark_late_data(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(src))
    agg = windowed_activity(
        parse_change_events_single_pass(stream),
        window_duration="1 minute",
        watermark_delay="2 minutes",
    )
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        # batch 1: two events in window [00:00, 00:01), one delete in
        # [00:05, 00:06) → max event time 00:05:00, watermark (after
        # this batch) = 00:03:00 → the [00:00, 00:01) window is now
        # older than the watermark.
        _write(
            [
                _ev(1, "2024-01-01T00:00:10"),
                _ev(2, "2024-01-01T00:00:50", turn=1),
                _ev(3, "2024-01-01T00:05:00", op="delete", turn=0),
            ],
            src / "f1.parquet",
        )
        q.processAllAvailable()

        # batch 2: one event at 00:00:30 is LATER than the watermark
        # (00:03) → dropped, its window already finalized; one at
        # 00:04:30 lands in the still-open [00:04, 00:05) window; one
        # at 00:10:00 advances the watermark to 00:08 so every earlier
        # window finalizes.
        _write(
            [
                _ev(4, "2024-01-01T00:00:30", turn=2),  # too late: dropped
                _ev(5, "2024-01-01T00:04:30", turn=3),  # within watermark
                _ev(6, "2024-01-01T00:10:00", turn=4),
            ],
            src / "f2.parquet",
        )
        q.processAllAvailable()
        # one more empty-input cycle so the advanced watermark emits
        # the finalized windows
        _write([_ev(7, "2024-01-01T00:10:01", turn=5)], src / "f3.parquet")
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        (r.window_start.isoformat(), r.conv_id): (
            r.n_events,
            r.n_deletes,
            r.max_turn,
        )
        for r in spark.read.parquet(out).collect()
    }
    # [00:00, 00:01): finalized with the 2 on-time events ONLY — the
    # seq-4 late event was dropped, so n_events=2 and max_turn=1 (not 2)
    assert rows[("2024-01-01T00:00:00", "c1")] == (2, 0, 1)
    # [00:05, 00:06): the delete
    assert rows[("2024-01-01T00:05:00", "c1")] == (1, 1, 0)
    # [00:04, 00:05): the late-but-within-watermark event WAS counted
    assert rows[("2024-01-01T00:04:00", "c1")] == (1, 0, 3)
    # the 00:10 windows are still open (watermark 00:08:01) → not emitted
    assert ("2024-01-01T00:10:00", "c1") not in rows


def test_windowed_activity_batch_shape(spark):
    """Batch mode: same operator, watermark a no-op, every window
    present (this shape is the windowed_activity oracle query)."""
    df = spark.createDataFrame(
        [_ev(1, "2024-01-01T00:00:10"), _ev(2, "2024-01-01T00:02:30", turn=7)],
        "seq long, event_json string",
    )
    got = {
        (r.window_start.isoformat(), r.conv_id): (r.n_events, r.max_turn)
        for r in windowed_activity(
            parse_change_events_single_pass(df)
        ).collect()
    }
    assert got == {
        ("2024-01-01T00:00:00", "c1"): (1, 0),
        ("2024-01-01T00:02:00", "c1"): (1, 7),
    }


def test_session_window_streaming_with_watermark(spark, tmp_path):
    """Gap sessionization in STREAMING mode: the session_window
    formulation runs under a watermark with append-mode emission —
    sessions close when the watermark passes their (end + gap)."""
    src = tmp_path / "sess_in"
    src.mkdir()
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(src))
    changes = parse_change_events_single_pass(stream)
    sessions = (
        changes.withWatermark("ts", "1 minute")
        .groupBy("conv_id", F.session_window("ts", "30 seconds"))
        .agg(F.count(F.lit(1)).cast("int").alias("n_events"))
        .select(
            "conv_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    q = (
        sessions.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        # session A: two events 10s apart; then a 00:05 event opens
        # session B and advances the watermark to 00:04 -> A closes
        _write(
            [
                _ev(1, "2024-01-01T00:00:00"),
                _ev(2, "2024-01-01T00:00:10", turn=1),
                _ev(3, "2024-01-01T00:05:00", turn=2),
            ],
            src / "f1.parquet",
        )
        q.processAllAvailable()
        # advance watermark past B's close
        _write([_ev(4, "2024-01-01T00:10:00", turn=3)], src / "f2.parquet")
        q.processAllAvailable()
        _write([_ev(5, "2024-01-01T00:15:00", turn=4)], src / "f3.parquet")
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        (r.session_start.isoformat(), r.n_events)
        for r in spark.read.parquet(out).collect()
    }
    # A: [00:00:00, 00:00:40) with 2 events; B: [00:05:00, 00:05:30) with 1
    assert ("2024-01-01T00:00:00", 2) in rows
    assert ("2024-01-01T00:05:00", 1) in rows
    # the 00:15 session is still open -> not emitted
    assert not any(s.startswith("2024-01-01T00:15") for s, _ in rows)


def test_windowed_activity_sliding(spark):
    """Sliding windows: a single event lands in window/slide
    overlapping windows."""
    df = spark.createDataFrame(
        [_ev(1, "2024-01-01T00:02:10")], "seq long, event_json string"
    )
    got = sorted(
        r.window_start.isoformat()
        for r in windowed_activity(
            parse_change_events_single_pass(df),
            window_duration="2 minutes",
            slide_duration="1 minute",
        ).collect()
    )
    assert got == ["2024-01-01T00:01:00", "2024-01-01T00:02:00"]
