"""Full-snapshot resync with delete detection
(``pipeline/reconcile.snapshot_diff`` / ``snapshot_resync``).

Contract under test: given an authoritative full dump, the operator
writes the MINIMAL change batch — upserts only for missing/differing
keys (null-safe content compare), tombstones only for vanished keys —
through the sink's ordinary exactly-once path, so untouched rows keep
their stamps, the resync is idempotent on its batch id, and the final
visible state equals the snapshot on the compared columns.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from embulk_util_json_spark.pipeline.reconcile import snapshot_diff, snapshot_resync
from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink

TS = datetime.datetime(2024, 1, 1, 0, 0, 0)
RTS = datetime.datetime(2024, 6, 1, 0, 0, 0)


def _state(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )


def _sink(spark, tmp_path, rows):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=4, mode="mor")
    changes = _state(spark, rows).select(
        "*",
        F.lit("insert").alias("op"),
        F.lit(TS).alias("ts"),
        F.monotonically_increasing_id().alias("seq"),
    )
    sink.apply(changes, "seed")
    return sink


def test_diff_is_minimal_and_nullsafe(spark):
    state = _state(
        spark,
        [
            ("c1", 0, "user", "same", None),      # untouched (NULL-safe tool)
            ("c1", 1, "user", "old", "t"),        # differing -> upsert
            ("c2", 0, "user", "gone", "t"),       # vanished  -> delete
        ],
    )
    snap = _state(
        spark,
        [
            ("c1", 0, "user", "same", None),
            ("c1", 1, "user", "new", "t"),
            ("c3", 0, "user", "born", "t"),       # missing   -> upsert
        ],
    )
    diff = snapshot_diff(
        state, snap, ["conv_id", "turn_idx"], RTS, ["role", "text", "tool"]
    ).collect()
    by_op = {}
    for r in diff:
        by_op.setdefault(r.op, []).append(r)
    assert len(diff) == 3
    assert {(r.conv_id, r.turn_idx) for r in by_op["update"]} == {("c1", 1), ("c3", 0)}
    (d,) = by_op["delete"]
    assert (d.conv_id, d.turn_idx) == ("c2", 0)
    assert d.role is None and d.text is None
    assert all(r.ts == RTS and r.seq == 0 for r in diff)


def test_resync_repairs_drift_and_keeps_untouched_stamps(spark, tmp_path):
    sink = _sink(
        spark,
        tmp_path,
        [
            ("c1", 0, "user", "same", "t"),
            ("c1", 1, "user", "old", "t"),
            ("c2", 0, "user", "gone", "t"),
        ],
    )
    snap = _state(
        spark,
        [
            ("c1", 0, "user", "same", "t"),
            ("c1", 1, "user", "new", "t"),
            ("c3", 0, "user", "born", "t"),
        ],
    )
    res = snapshot_resync(sink, snap, RTS, "resync-1")
    assert res["change_rows"] == 3  # 2 upserts + 1 tombstone, never the table
    got = {
        (r.conv_id, r.turn_idx): (r.text, r.ts)
        for r in sink.read().collect()
    }
    assert got == {
        ("c1", 0): ("same", TS),    # untouched: original stamp survives
        ("c1", 1): ("new", RTS),    # repaired: resync stamp
        ("c3", 0): ("born", RTS),
    }


def test_resync_detects_nothing_on_converged_state(spark, tmp_path):
    rows = [("c1", 0, "user", "a", "t"), ("c1", 1, "user", "b", None)]
    sink = _sink(spark, tmp_path, rows)
    res = snapshot_resync(sink, _state(spark, rows), RTS, "noop")
    assert res["change_rows"] == 0
    assert {(r.conv_id, r.turn_idx, r.ts) for r in sink.read().collect()} == {
        ("c1", 0, TS), ("c1", 1, TS),
    }


def test_resync_idempotent_on_batch_id(spark, tmp_path):
    sink = _sink(spark, tmp_path, [("c1", 0, "user", "old", "t")])
    snap = _state(spark, [("c1", 0, "user", "new", "t")])
    snapshot_resync(sink, snap, RTS, "resync-1")
    res2 = snapshot_resync(sink, snap, RTS, "resync-1")
    assert res2.get("skipped") is True


def test_resync_revives_tombstoned_key(spark, tmp_path):
    sink = _sink(spark, tmp_path, [("c1", 0, "user", "a", "t")])
    tomb = _state(spark, [("c1", 0, None, None, None)]).select(
        "*",
        F.lit("delete").alias("op"),
        F.lit(TS + datetime.timedelta(minutes=1)).alias("ts"),
        F.lit(100).cast("long").alias("seq"),
    )
    sink.apply(tomb, "del")
    assert sink.read().count() == 0
    res = snapshot_resync(
        sink, _state(spark, [("c1", 0, "user", "a", "t")]), RTS, "resync-1"
    )
    assert res["change_rows"] == 1
    (r,) = sink.read().collect()
    assert (r.conv_id, r.text, r.ts) == ("c1", "a", RTS)


def test_resync_rejects_nothing_but_needs_winning_stamp(spark, tmp_path):
    """Documented precondition: resync_ts must beat stored stamps —
    with a stale stamp the snapshot loses under LWW (exactly the
    merge contract, not a special case)."""
    sink = _sink(spark, tmp_path, [("c1", 0, "user", "old", "t")])
    stale = TS - datetime.timedelta(days=1)
    snapshot_resync(sink, _state(spark, [("c1", 0, "user", "new", "t")]), stale, "r")
    (r,) = sink.read().collect()
    assert r.text == "old"


def test_fsck_clean_table(spark, tmp_path):
    from embulk_util_json_spark.pipeline.reconcile import fsck

    sink = _sink(spark, tmp_path, [("c1", 0, "u", "a", "t"), ("c2", 1, "u", "b", None)])
    rep = fsck(sink, deep=True)
    assert rep["ok"] and rep["checked_paths"] > 0
    assert rep["missing_paths"] == [] and rep["dangling_stats"] == []
    assert rep["misplaced_rows"] == 0


def test_fsck_flags_missing_path(spark, tmp_path):
    import os
    import shutil

    from embulk_util_json_spark.pipeline.reconcile import fsck

    sink = _sink(spark, tmp_path, [("c1", 0, "u", "a", "t"), ("c2", 1, "u", "b", None)])
    m = sink.current_manifest()
    victim = next(iter(sorted(m["buckets"])))
    shutil.rmtree(os.path.join(sink.root, m["buckets"][victim][0]))
    rep = fsck(sink)
    assert not rep["ok"]
    assert rep["missing_paths"] == [m["buckets"][victim][0]]


def test_fsck_deep_flags_misplaced_rows(spark, tmp_path):
    """Rows moved into the wrong bucket directory out of band (the
    damage class that silently breaks bucket-pruned lookups) are
    counted by the deep pass."""
    import os
    import shutil

    from embulk_util_json_spark.pipeline.reconcile import fsck

    rows = [(f"c{i}", i, "u", f"t{i}", None) for i in range(12)]
    sink = _sink(spark, tmp_path, rows)
    m = sink.current_manifest()
    bs = sorted(m["buckets"], key=int)
    a, b = bs[0], bs[1]
    # graft bucket a's files into bucket b's directory
    src = os.path.join(sink.root, m["buckets"][a][0])
    dst = os.path.join(sink.root, m["buckets"][b][0])
    moved = 0
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src, f), os.path.join(dst, "x_" + f))
            moved += 1
    assert moved
    rep = fsck(sink, deep=True)
    assert not rep["ok"]
    assert rep["misplaced_rows"] > 0
