"""wal2json (PostgreSQL logical decoding, format v2) adapter.

Contract under test: the fourth wire format normalizes to the exact
canonical change-row schema. wal2json is the only adapter whose row
image arrives as an ARRAY of {name,type,value} structs (not a JSON
object), whose deletes carry a separate ``identity`` member, and
whose timestamps carry an explicit zone offset — the tests pin the
array→map pivot, identity-based tombstones, offset normalization to
UTC at microsecond precision, control-action (B/C/T/M) filtering vs
quarantine, and the rewrap round trip vs the native parser.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from embulk_util_json_spark.sources.events import parse_change_events_single_pass
from embulk_util_json_spark.sources.wal2json import (
    parse_wal2json_events,
    parse_wal2json_txn_stream,
    to_wal2json_json,
    to_wal2json_txn_json,
)

NATIVE_EVENTS = [
    (10, '{"op":"insert","ts":"2024-03-01 10:00:00.000123",'
         '"data":{"conv_id":"c1","turn_idx":0,"role":"user","text":"t0","tool":null}}'),
    (11, '{"op":"update","ts":"2024-03-01 10:00:00.999999",'
         '"data":{"conv_id":"c1","turn_idx":0,"role":"user","text":"t0v2","tool":null}}'),
    (12, '{"op":"delete","ts":"2024-03-01 10:00:01.500000",'
         '"data":{"conv_id":"c1","turn_idx":0,"role":"user","text":"t0v2","tool":null}}'),
    (13, '{"op":"insert","ts":"2024-03-01 10:00:02",'
         '"data":{"conv_id":"c2","turn_idx":0,"role":"user","text":"x0",'
         '"tool":"search","model":"m-9"}}'),
]


def _native(spark):
    return spark.createDataFrame(NATIVE_EVENTS, "seq long, event_json string")


def test_roundtrip_equals_native_parse(spark):
    """adapter ∘ rewrap ≡ native single-pass parse, bit-for-bit
    (microsecond timestamps, extras map included)."""
    native = _native(spark)
    a = parse_change_events_single_pass(native).orderBy("seq").collect()
    b = (
        parse_wal2json_events(to_wal2json_json(native))
        .orderBy("seq")
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_wire_shape_is_wal2json_v2(spark):
    """The rewrap emits real wal2json v2 members: action letters,
    columns as an array of {name,type,value}, deletes via identity
    (REPLICA IDENTITY FULL), per-action +00 timestamps."""
    wire = {r.seq: json.loads(r.event_json) for r in to_wal2json_json(_native(spark)).collect()}
    ins, upd, dele = wire[10], wire[11], wire[12]
    assert (ins["action"], upd["action"], dele["action"]) == ("I", "U", "D")
    assert ins["table"] == "transcripts" and ins["schema"] == "public"
    assert ins["timestamp"].endswith("+00")
    names = [c["name"] for c in ins["columns"]]
    assert {"conv_id", "turn_idx", "role", "text"} <= set(names)
    by_name = {c["name"]: c for c in ins["columns"]}
    assert by_name["turn_idx"]["type"] == "integer"
    assert by_name["turn_idx"]["value"] == "0"
    assert "columns" not in dele or dele["columns"] is None
    assert [c["name"] for c in dele["identity"]]  # full old row present


def test_identity_delete_and_zone_offsets(spark):
    """Deletes materialize from ``identity``; +HH / -HH:MM offsets
    normalize to the same UTC instant at microsecond precision."""
    rows = [
        (1, '{"action":"D","table":"t","timestamp":"2024-03-01 12:00:00.000001+02",'
            '"identity":[{"name":"conv_id","value":"c9"},{"name":"turn_idx","value":3}]}'),
        (2, '{"action":"D","table":"t","timestamp":"2024-03-01 04:30:00.000001-05:30",'
            '"identity":[{"name":"conv_id","value":"c9"},{"name":"turn_idx","value":4}]}'),
    ]
    out = parse_wal2json_events(
        spark.createDataFrame(rows, "seq long, event_json string")
    ).orderBy("seq").collect()
    assert [r.op for r in out] == ["delete", "delete"]
    assert [r.conv_id for r in out] == ["c9", "c9"]
    assert [r.turn_idx for r in out] == [3, 4]
    assert str(out[0].ts) == "2024-03-01 10:00:00.000001"
    assert str(out[1].ts) == "2024-03-01 10:00:00.000001"


def test_control_actions_dropped_unknown_quarantined(spark):
    """B/C (txn), T (truncate), M (message) are stream structure —
    dropped, NOT quarantine. An unknown action and malformed JSON
    surface as NULL-op rows (the row-skippable taxonomy)."""
    rows = [
        (1, '{"action":"B","timestamp":"2024-03-01 10:00:00+00"}'),
        (2, '{"action":"I","table":"t","timestamp":"2024-03-01 10:00:00.5+00",'
            '"columns":[{"name":"conv_id","value":"c1"},{"name":"turn_idx","value":0},'
            '{"name":"role","value":"user"},{"name":"text","value":"hi"}]}'),
        (3, '{"action":"C","timestamp":"2024-03-01 10:00:01+00"}'),
        (4, '{"action":"T","schema":"public","table":"t"}'),
        (5, '{"action":"M","prefix":"wal2json","content":"x"}'),
        (6, '{"action":"Z","table":"t"}'),
        (7, 'not json'),
    ]
    out = parse_wal2json_events(
        spark.createDataFrame(rows, "seq long, event_json string")
    )
    assert sorted(r.seq for r in out.collect()) == [2, 6, 7]
    quarantined = out.filter(F.col("op").isNull())
    assert sorted(r.seq for r in quarantined.collect()) == [6, 7]
    good = out.filter(F.col("op").isNotNull()).collect()
    assert len(good) == 1 and good[0].text == "hi"


def test_extras_ride_through_and_with_table(spark):
    """Unknown columns land in ``_extras`` (schema evolution rides the
    wire identically to native); ``with_table`` surfaces the action's
    table member for the routing demux."""
    out = parse_wal2json_events(
        to_wal2json_json(_native(spark)), with_table=True
    )
    assert "_table" in out.columns
    evo = out.filter(F.col("seq") == 13).collect()[0]
    assert evo._table == "transcripts"
    assert evo._extras == {"model": "m-9"}
    assert evo.tool == "search"


def test_txn_framing_roundtrip_and_boundary_hold(spark, tmp_path):
    """to_wal2json_txn_json frames rows in B/C transactions with
    per-action xids; parse_wal2json_txn_stream splits rows/markers;
    TxnBoundaryApplier holds a transaction cut mid-batch until its C
    arrives, and the drained final state equals the plain LWW fold."""
    import json as _json

    from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
    from embulk_util_json_spark.streaming.txn_boundary import TxnBoundaryApplier

    nat = [
        (
            i,
            '{"op":"insert","ts":"2024-01-01 00:%02d:%02d.%06d","data":{"conv_id":"c%d",'
            '"turn_idx":%d,"role":"user","text":"t-%d","tool":null}}'
            % (i // 60, i % 60, i, i % 5, i % 4, i),
        )
        for i in range(40)
    ]
    natdf = spark.createDataFrame(nat, "seq long, event_json string")
    wire = to_wal2json_txn_json(natdf, txn_size=16)
    docs = {r.seq: _json.loads(r.event_json) for r in wire.collect()}
    # framing: B at txn start, C at txn end, xid on every action
    assert docs[0]["action"] == "B" and docs[0]["xid"] == 0
    assert docs[15 * 3 + 2]["action"] == "C" and docs[15 * 3 + 2]["xid"] == 0
    assert all("xid" in d for d in docs.values())
    rows, markers = parse_wal2json_txn_stream(wire)
    assert rows.count() == 40
    assert sorted((m.txid, m.status) for m in markers.collect()) == [
        (0, "commit"), (1, "commit"), (2, "commit"),
    ]

    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=4)
    ap = TxnBoundaryApplier(
        spark, sink, str(tmp_path / "txn"), parse_fn=parse_wal2json_events
    )
    # batch 1 cuts INSIDE txn 1 (wire seq < 60 ≈ source seq < 20) and
    # carries only txn 0's commit → txn 1's head must be held
    r1 = ap.apply(rows.filter(F.col("seq") < 60), markers.filter(F.col("txid") == 0))
    assert r1["applied_rows"] == 16 and r1["held_batch"] and r1["open_rows"] == 4
    r2 = ap.apply(rows.filter(F.col("seq") >= 60), markers.filter(F.col("txid") > 0))
    assert r2["applied_rows"] == 24 and r2["open_rows"] == 0
    got = sorted(
        (q.conv_id, q.turn_idx, q.text) for q in sink.read().collect()
    )
    want = sorted(
        (q.conv_id, q.turn_idx, q.text)
        for q in parse_change_events_single_pass(natdf)
        .withColumn(
            "rn",
            F.expr(
                "row_number() over (partition by conv_id, turn_idx "
                "order by ts desc, seq desc)"
            ),
        )
        .filter("rn = 1 and op <> 'delete'")
        .collect()
    )
    assert got == want


def test_values_keep_json_text_coercion(spark):
    """Non-string JSON scalars in ``value`` coerce to their text, same
    contract as the map<string,string> parsers: a numeric turn_idx
    arrives as a JSON number on the wire and still types as int."""
    rows = [
        (1, '{"action":"I","table":"t","timestamp":"2024-03-01 10:00:00+00",'
            '"columns":[{"name":"conv_id","value":"c1"},{"name":"turn_idx","value":7},'
            '{"name":"role","value":"user"},{"name":"text","value":"n"},'
            '{"name":"score","value":0.5}]}'),
    ]
    out = parse_wal2json_events(
        spark.createDataFrame(rows, "seq long, event_json string")
    ).collect()[0]
    assert out.turn_idx == 7
    assert out._extras == {"score": "0.5"}
