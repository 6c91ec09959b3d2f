"""JSONL source: batch read, in-document seq extraction, and a
streaming tail feeding the exactly-once sink."""

import json

from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
from embulk_util_json_spark.sources.jsonl import read_jsonl, stream_jsonl
from embulk_util_json_spark.streaming.runner import apply_events_batch


def _line(seq, op, ts, conv, turn, text):
    return json.dumps(
        {
            "seq": seq,
            "op": op,
            "ts": ts,
            "data": {
                "conv_id": conv,
                "turn_idx": turn,
                "role": "user",
                "text": text,
                "tool": None,
            },
        }
    )


LINES = [
    _line(0, "insert", "2024-01-01T00:00:00", "c1", 0, "hello"),
    _line(1, "insert", "2024-01-01T00:00:01", "c1", 1, "world"),
    _line(2, "update", "2024-01-01T00:00:02", "c1", 0, "hello v2"),
    _line(3, "delete", "2024-01-01T00:00:03", "c1", 1, ""),
    _line(4, "insert", "2024-01-01T00:00:04", "c2", 0, "other"),
]


def test_read_jsonl_with_seq_member(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "part-0.jsonl").write_text("\n".join(LINES[:3]) + "\n\n")
    (d / "part-1.jsonl").write_text("\n".join(LINES[3:]) + "\n")
    df = read_jsonl(spark, str(d), seq_col="seq")
    assert sorted(r.seq for r in df.collect()) == [0, 1, 2, 3, 4]


def test_read_jsonl_synthetic_seq(spark, tmp_path):
    d = tmp_path / "in2"
    d.mkdir()
    (d / "a.jsonl").write_text("\n".join(LINES) + "\n")
    df = read_jsonl(spark, str(d))
    seqs = [r.seq for r in df.collect()]
    assert len(seqs) == len(set(seqs)) == 5  # unique, not necessarily dense


def test_jsonl_batch_to_sink(spark, tmp_path):
    d = tmp_path / "in3"
    d.mkdir()
    (d / "a.jsonl").write_text("\n".join(LINES) + "\n")
    events = read_jsonl(spark, str(d), seq_col="seq")
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=2)
    apply_events_batch(events, sink, "b0")
    got = {(r.conv_id, r.turn_idx): r.text for r in sink.read().collect()}
    assert got == {("c1", 0): "hello v2", ("c2", 0): "other"}


def test_stream_jsonl_exactly_once(spark, tmp_path):
    d = tmp_path / "sin"
    d.mkdir()
    (d / "p0.jsonl").write_text("\n".join(LINES[:3]) + "\n")
    sink = ParquetSnapshotSink(spark, str(tmp_path / "ts"), num_buckets=2, mode="mor")
    ckpt = str(tmp_path / "ck")

    def run():
        stream = stream_jsonl(spark, str(d), seq_col="seq")
        q = (
            stream.writeStream.foreachBatch(
                lambda b, eid: apply_events_batch(b, sink, f"jl-{eid}")
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    assert sink.read().count() == 2  # c1/0, c1/1
    (d / "p1.jsonl").write_text("\n".join(LINES[3:]) + "\n")
    run()  # resume from checkpoint picks up only the new file
    got = {(r.conv_id, r.turn_idx): r.text for r in sink.read().collect()}
    assert got == {("c1", 0): "hello v2", ("c2", 0): "other"}
