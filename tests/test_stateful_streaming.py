"""Custom stateful streaming operator: per-conversation running
progress via applyInPandasWithState, state surviving across
micro-batches and checkpoint restarts."""

import json

import pyarrow as pa
import pyarrow.parquet as pq

from embulk_util_json_spark.sources.events import parse_change_events_single_pass
from embulk_util_json_spark.streaming.runner import EVENTS_SCHEMA
from embulk_util_json_spark.streaming.stateful import conversation_progress


def _ev(seq, op, conv, turn):
    return (
        seq,
        json.dumps(
            {
                "op": op,
                "ts": f"2024-01-01T00:00:{seq:02d}",
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


def test_conversation_progress_state_across_batches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ck")
    _write([_ev(0, "insert", "c1", 0), _ev(1, "insert", "c1", 3),
            _ev(2, "insert", "c2", 0)], src / "p0.parquet")

    def run():
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(src))
        prog = conversation_progress(parse_change_events_single_pass(stream))
        q = (
            prog.writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    rows = {
        r.conv_id: r for r in spark.read.parquet(str(out)).collect()
    }
    assert rows["c1"].events_seen == 2 and rows["c1"].max_turn == 3
    assert rows["c2"].events_seen == 1 and rows["c2"].max_turn == 0

    # second file: state resumes from checkpoint and accumulates
    _write([_ev(3, "delete", "c1", 3), _ev(4, "insert", "c1", 7)], src / "p1.parquet")
    run()
    latest = {}
    for r in spark.read.parquet(str(out)).collect():
        if r.conv_id not in latest or r.events_seen > latest[r.conv_id].events_seen:
            latest[r.conv_id] = r
    assert latest["c1"].events_seen == 4
    assert latest["c1"].max_turn == 7
    assert latest["c1"].deletes == 1
    assert latest["c2"].events_seen == 1
