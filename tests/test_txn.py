"""Atomic multi-table transactions (sinks/txn.TransactionLog):
all-or-nothing visibility across independently-committing sinks,
crash-replay convergence, the pending-intent guard (a crashed
transaction must be replayed before a new one touches its tables —
sink chains are cumulative, so a later commit would otherwise expose
the crashed half), and snapshot-pinned consistent reads."""

from __future__ import annotations

import datetime
import json

import pytest

from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
from embulk_util_json_spark.sinks.txn import (
    PendingTransactionError,
    TransactionLog,
)

DDL = (
    "conv_id string, turn_idx int, ts timestamp, seq long, "
    "op string, role string, text string, tool string"
)


def _rows(spark, specs):
    base = datetime.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [
            (c, t, base + datetime.timedelta(seconds=seq), seq, op, "user", txt, None)
            for (c, t, seq, op, txt) in specs
        ],
        DDL,
    )


def _sinks(spark, tmp_path):
    return {
        "a": ParquetSnapshotSink(spark, str(tmp_path / "a"), num_buckets=2, mode="mor"),
        "b": ParquetSnapshotSink(spark, str(tmp_path / "b"), num_buckets=2, mode="mor"),
    }


def _state(df):
    return {
        (r.conv_id, r.turn_idx): r.text
        for r in df.select("conv_id", "turn_idx", "text").collect()
    }


def test_txn_atomic_visibility_and_crash_replay(spark, tmp_path):
    sinks = _sinks(spark, tmp_path)
    log = TransactionLog(str(tmp_path))

    r1 = log.txn_apply(
        sinks,
        {
            "a": _rows(spark, [("c1", 0, 1, "insert", "a1")]),
            "b": _rows(spark, [("d1", 0, 2, "insert", "b1")]),
        },
        "txn-1",
    )
    assert r1["seq"] == 1
    snap = log.consistent_read(sinks)
    assert _state(snap["a"]) == {("c1", 0): "a1"}
    assert _state(snap["b"]) == {("d1", 0): "b1"}

    # crash mid-txn-2: the intent is written and table a's slice
    # lands, but the record never commits
    a2 = _rows(spark, [("c1", 0, 3, "update", "a2")])
    b2 = _rows(spark, [("d1", 0, 4, "update", "b2")])
    with open(log._intent_path("txn-2"), "w") as fh:
        json.dump({"txn_id": "txn-2", "tables": ["a", "b"]}, fh)
    sinks["a"].apply(a2, "txn-2:a")
    # consistent view still serves txn-1 for BOTH tables — no torn read
    snap = log.consistent_read(sinks)
    assert _state(snap["a"]) == {("c1", 0): "a1"}
    assert _state(snap["b"]) == {("d1", 0): "b1"}
    # ...even though table a's CURRENT state already moved
    assert _state(sinks["a"].read()) == {("c1", 0): "a2"}

    # a DIFFERENT transaction touching table a is refused while txn-2
    # is pending: committing it would pin a cumulative version of a
    # that contains txn-2's half — the torn read the log exists to
    # prevent
    with pytest.raises(PendingTransactionError, match="txn-2"):
        log.txn_apply(
            sinks, {"a": _rows(spark, [("c9", 0, 9, "insert", "x")])}, "txn-3"
        )

    # replaying the whole transaction converges: a's apply skips
    # (sink batch-id log, version recovered from the manifest log),
    # b's lands, the record commits once, the intent clears
    r2 = log.txn_apply(sinks, {"a": a2, "b": b2}, "txn-2")
    assert r2["seq"] == 2
    assert r2["tables"]["a"].get("skipped")
    assert not r2["tables"]["b"].get("skipped")
    assert log.pending_intents() == {}
    snap = log.consistent_read(sinks)
    assert _state(snap["a"]) == {("c1", 0): "a2"}
    assert _state(snap["b"]) == {("d1", 0): "b2"}
    # the recovered-version record pins a's txn-2 version exactly
    assert log.committed_versions()["a"] == 2

    # ...and the previously-refused transaction now lands
    r3 = log.txn_apply(
        sinks, {"a": _rows(spark, [("c9", 0, 9, "insert", "x")])}, "txn-3"
    )
    assert r3["seq"] == 3

    # a committed transaction re-runs as a pure skip
    r2b = log.txn_apply(sinks, {"a": a2, "b": b2}, "txn-2")
    assert r2b["skipped"]
    assert log.current_seq() == 3


def test_txn_partial_table_participation_and_time_travel(spark, tmp_path):
    sinks = _sinks(spark, tmp_path)
    log = TransactionLog(str(tmp_path))
    log.txn_apply(
        sinks, {"a": _rows(spark, [("c1", 0, 1, "insert", "a1")])}, "t1"
    )
    # b never participated: it reads EMPTY through the txn view (typed),
    # not whatever its current state happens to be
    snap = log.consistent_read(sinks)
    assert _state(snap["b"]) == {}
    assert "conv_id" in snap["b"].columns

    log.txn_apply(
        sinks,
        {
            "a": _rows(spark, [("c1", 0, 2, "update", "a2")]),
            "b": _rows(spark, [("d1", 0, 3, "insert", "b1")]),
        },
        "t2",
    )
    # carried-forward versions: a txn touching only b still pins a
    log.txn_apply(
        sinks, {"b": _rows(spark, [("d1", 0, 4, "update", "b2")])}, "t3"
    )
    head = log.committed_versions()
    assert head["a"] == 2 and head["b"] == 2
    # time travel to any committed txn snapshot
    at1 = log.consistent_read(sinks, at_seq=1)
    assert _state(at1["a"]) == {("c1", 0): "a1"} and _state(at1["b"]) == {}
    at2 = log.consistent_read(sinks, at_seq=2)
    assert _state(at2["a"]) == {("c1", 0): "a2"}
    assert _state(at2["b"]) == {("d1", 0): "b1"}
    # at_seq=0 = before ANY transaction: empty on every table, with
    # the tables' REAL schemas (a has data → footer/read types)
    at0 = log.consistent_read(sinks, at_seq=0)
    assert _state(at0["a"]) == {} and _state(at0["b"]) == {}
    assert "conv_id" in at0["a"].columns
    # beyond the log is a loud error, not a silent head read
    with pytest.raises(ValueError, match="no committed txn record"):
        log.consistent_read(sinks, at_seq=99)


def test_route_tables_with_txn_log_is_atomic(spark, tmp_path):
    """route_tables(txn_log=...) upgrades a demuxed micro-batch to an
    atomic multi-table transaction: both tables become visible
    together through consistent_read, redelivery is a skip, and the
    unrouted metric survives the txn path."""
    from tests.test_cdc_e2e import _mt_ev
    from embulk_util_json_spark.streaming.runner import route_tables

    rows = [
        _mt_ev(1, "a", "c1", 0, "x"),
        _mt_ev(2, "b", "c2", 0, "y"),
        _mt_ev(3, "nowhere", "cz", 0, "lost"),
    ]
    df = spark.createDataFrame(rows, "seq long, event_json string")
    sinks = _sinks(spark, tmp_path)
    log = TransactionLog(str(tmp_path))

    out = route_tables(df, sinks, "e0", txn_log=log)
    assert out["unrouted_rows"] == 1
    assert not out["tables"]["a"].get("skipped")
    snap = log.consistent_read(sinks)
    assert _state(snap["a"]) == {("c1", 0): "x"}
    assert _state(snap["b"]) == {("c2", 0): "y"}
    assert log.committed_versions() == {"a": 1, "b": 1}

    # redelivered epoch: txn-level skip, tables untouched, metric intact
    out2 = route_tables(df, sinks, "e0", txn_log=log)
    assert all(r.get("skipped") for r in out2["tables"].values())
    assert out2["unrouted_rows"] == 1
    assert log.current_seq() == 1
    # same batch ids as the non-txn path → switchable mid-stream
    assert sinks["a"].applied_batch_ids() == ["e0:a"]
