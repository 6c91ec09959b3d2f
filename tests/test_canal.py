"""Canal (Alibaba flat-message) wire-format adapter.

Contract under test: the third wire format normalizes to the exact
canonical change-row schema — but unlike Debezium/Maxwell it BATCHES
rows (one envelope per binlog event), so the tests pin the 1→N
expansion, the derived per-row seq order, and the quarantine path's
envelope-seq recovery (``to_raw_seq``).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from embulk_util_json_spark.sources.canal import (
    CANAL_SEQ_STRIDE,
    parse_canal_events,
    to_canal_json,
)
from embulk_util_json_spark.sources.events import parse_change_events_single_pass

# Four consecutive inserts in the same millisecond (one statement →
# one Canal envelope), then a same-ms update run, a delete, and an
# evolution row — µs components differ INSIDE the shared millisecond.
NATIVE_EVENTS = [
    (10, '{"op":"insert","ts":"2024-03-01 10:00:00.001100",'
         '"data":{"conv_id":"c1","turn_idx":0,"role":"user","text":"t0","tool":null}}'),
    (11, '{"op":"insert","ts":"2024-03-01 10:00:00.001200",'
         '"data":{"conv_id":"c1","turn_idx":1,"role":"assistant","text":"t1","tool":null}}'),
    (12, '{"op":"insert","ts":"2024-03-01 10:00:00.001300",'
         '"data":{"conv_id":"c1","turn_idx":2,"role":"user","text":"t2","tool":null}}'),
    (13, '{"op":"update","ts":"2024-03-01 10:00:00.001400",'
         '"data":{"conv_id":"c1","turn_idx":0,"role":"user","text":"t0v2","tool":null}}'),
    (14, '{"op":"delete","ts":"2024-03-01 10:00:01",'
         '"data":{"conv_id":"c1","turn_idx":2,"role":"user","text":"t2","tool":null}}'),
    (15, '{"op":"insert","ts":"2024-03-01 10:00:02",'
         '"data":{"conv_id":"c2","turn_idx":0,"role":"user","text":"x0",'
         '"tool":"search","model":"m-9"}}'),
]


def _native_df(spark, rows=NATIVE_EVENTS):
    return spark.createDataFrame(rows, "seq long, event_json string")


def test_rewrap_batches_consecutive_same_ms_runs(spark):
    wire = to_canal_json(_native_df(spark)).orderBy("seq").collect()
    # runs: [10,11,12] (insert @ .001), [13] (update @ .001), [14], [15]
    assert [r.seq for r in wire] == [10, 13, 14, 15]
    envs = [json.loads(r.event_json) for r in wire]
    assert [len(e["data"]) for e in envs] == [3, 1, 1, 1]
    assert envs[0]["type"] == "INSERT" and not envs[0]["isDdl"]
    # intra-envelope order is source-seq order
    assert [d["text"] for d in envs[0]["data"]] == ["t0", "t1", "t2"]
    # es is the shared millisecond
    assert envs[0]["es"] == envs[1]["es"]


def test_roundtrip_matches_native_at_ms_precision(spark):
    native = _native_df(spark)
    exp = parse_change_events_single_pass(native).orderBy("seq").collect()
    got = parse_canal_events(to_canal_json(native)).orderBy("seq").collect()
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert (g.op, g.conv_id, g.turn_idx, g.role, g.text, g.tool) == (
            e.op, e.conv_id, e.turn_idx, e.role, e.text, e.tool
        )
        # ms truncation, never reordering
        assert g.ts == e.ts.replace(microsecond=e.ts.microsecond // 1000 * 1000)
        assert dict(g._extras or {}) == dict(e._extras or {})
    # derived seqs: envelope seq × stride + array position
    assert [g.seq for g in got[:4]] == [
        10 * CANAL_SEQ_STRIDE, 10 * CANAL_SEQ_STRIDE + 1,
        10 * CANAL_SEQ_STRIDE + 2, 13 * CANAL_SEQ_STRIDE,
    ]


def test_multirow_envelope_expands_1_to_n(spark):
    env = json.dumps({
        "data": [
            {"conv_id": "c9", "turn_idx": "0", "role": "user", "text": "a"},
            {"conv_id": "c9", "turn_idx": "1", "role": "assistant", "text": "b"},
            {"conv_id": "c9", "turn_idx": "2", "role": "user", "text": "c"},
        ],
        "old": None, "database": "d", "table": "transcripts",
        "type": "INSERT", "es": 1709287200123, "ts": 1709287200456,
        "id": 7, "isDdl": False, "pkNames": ["conv_id", "turn_idx"],
    })
    out = parse_canal_events(
        spark.createDataFrame([(7, env)], "seq long, event_json string")
    ).orderBy("seq").collect()
    assert [(r.turn_idx, r.text) for r in out] == [(0, "a"), (1, "b"), (2, "c")]
    assert [r.seq for r in out] == [7 * CANAL_SEQ_STRIDE + i for i in range(3)]
    # es (binlog event time) wins over ts (delivery time)
    assert all(r.ts.microsecond == 123000 for r in out)
    assert {r.op for r in out} == {"insert"}


def test_ddl_and_unknown_types_quarantine(spark):
    rows = [
        (1, json.dumps({"data": None, "old": None, "database": "d",
                        "table": "t", "type": "CREATE", "es": 1, "ts": 1,
                        "id": 1, "isDdl": True, "pkNames": None})),
        (2, json.dumps({"data": [{"conv_id": "c1", "turn_idx": "0",
                                  "role": "u", "text": "x"}],
                        "old": None, "database": "d", "table": "t",
                        "type": "TRUNCATE", "es": 1, "ts": 1,
                        "id": 2, "isDdl": False, "pkNames": None})),
        (3, "{not json"),
    ]
    out = parse_canal_events(
        spark.createDataFrame(rows, "seq long, event_json string")
    ).collect()
    # each bad envelope survives as exactly one NULL-op row (the
    # row-skippable quarantine taxonomy), never a dropped row
    assert len(out) == 3
    assert all(r.op is None for r in out)


def test_quarantine_recovers_envelope_bytes(spark, tmp_path):
    """A malformed envelope inside a batched feed dead-letters the
    ORIGINAL wire bytes — to_raw_seq maps derived row seqs back."""
    from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
    from embulk_util_json_spark.streaming.runner import apply_events_batch

    good = to_canal_json(_native_df(spark)).collect()
    bad = (99, "{not json")
    df = spark.createDataFrame(
        [(r.seq, r.event_json) for r in good] + [bad],
        "seq long, event_json string",
    )
    sink = ParquetSnapshotSink(spark, str(tmp_path / "tbl"), num_buckets=2)
    qdir = str(tmp_path / "dlq")
    res = apply_events_batch(
        df, sink, "b1", quarantine_dir=qdir, parse_fn=parse_canal_events
    )
    assert res["malformed_rows"] == 1
    dead = spark.read.parquet(qdir + "/b1").collect()
    assert [(r.seq, r.event_json) for r in dead] == [bad]
    # the good rows landed: LWW winner inside the 3-row envelope run
    final = {
        (r.conv_id, r.turn_idx): r.text
        for r in sink.read().filter(F.col("op") != "delete").collect()
    }
    assert final[("c1", 0)] == "t0v2"  # same-ms tie broken by derived seq
    assert ("c1", 2) not in final      # deleted
    assert final[("c2", 0)] == "x0"


def test_to_raw_seq_exact_above_2_53(spark):
    """Row seq → envelope seq must be exact long arithmetic: double
    division loses integer precision above 2^53, mapping a dead-letter
    back to the WRONG raw envelope for large Kafka-offset-style seqs."""
    env_seqs = [0, 1, (1 << 33) + 12345, (1 << 43) - 1]
    rows = [(e * CANAL_SEQ_STRIDE + pos,) for e in env_seqs for pos in (0, 7, CANAL_SEQ_STRIDE - 1)]
    df = spark.createDataFrame(rows, "seq long")
    got = [
        r.env for r in df.select(
            parse_canal_events.to_raw_seq(F.col("seq")).alias("env")
        ).collect()
    ]
    want = [e for e in env_seqs for _ in range(3)]
    assert got == want
