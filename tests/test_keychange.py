"""Primary-key-change expansion (operators/keychange.py): a key-moving
update must leave no ghost at the vacated key, the tombstone must
participate in LWW ordering at the old key like a native delete, and
the expansion must be one scan (no union-of-filters double read)."""

import datetime

import pytest
from pyspark.sql import Row, functions as F

from embulk_util_json_spark.operators.keychange import expand_key_changes
from embulk_util_json_spark.operators.lww import lww_agg


def _ts(s):
    return datetime.datetime(2026, 1, 1, 0, 0, s)


def _changes(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                op=op,
                ts=_ts(sec),
                seq=seq,
                conv_id=conv,
                turn_idx=turn,
                role="r",
                text=f"t{seq}",
                tool="x",
                old_turn_idx=old,
            )
            for (op, sec, seq, conv, turn, old) in rows
        ],
        "op string, ts timestamp, seq long, conv_id string, "
        "turn_idx int, role string, text string, tool string, "
        "old_turn_idx int",
    )


def _final(df):
    out = lww_agg(df, ["conv_id", "turn_idx"], ["ts", "seq"]).filter(
        F.col("op") != "delete"
    )
    return sorted((r.conv_id, r.turn_idx, r.text) for r in out.collect())


def test_move_leaves_no_ghost(spark):
    ch = _changes(
        spark,
        [
            ("insert", 1, 1, "c", 1, None),
            ("update", 2, 2, "c", 2, 1),  # row moves key 1 -> 2
        ],
    )
    exp = expand_key_changes(ch, {"turn_idx": "old_turn_idx"})
    assert exp.count() == 3  # 2 source rows + 1 tombstone
    assert "old_turn_idx" not in exp.columns
    assert _final(exp) == [("c", 2, "t2")]


def test_passthrough_without_old_key(spark):
    ch = _changes(
        spark,
        [
            ("insert", 1, 1, "c", 1, None),
            ("update", 2, 2, "c", 1, None),
            # old == new: a no-op "move" must NOT tombstone its own key
            ("update", 3, 3, "c", 1, 1),
        ],
    )
    exp = expand_key_changes(ch, {"turn_idx": "old_turn_idx"})
    assert exp.count() == 3
    assert _final(exp) == [("c", 1, "t3")]


def test_reinsert_at_old_key_outstamps_tombstone(spark):
    ch = _changes(
        spark,
        [
            ("insert", 1, 1, "c", 1, None),
            ("update", 2, 2, "c", 2, 1),  # move 1 -> 2 (tombstone @1, ts=2)
            ("insert", 3, 3, "c", 1, None),  # later re-insert at key 1 wins
        ],
    )
    exp = expand_key_changes(ch, {"turn_idx": "old_turn_idx"})
    assert _final(exp) == [("c", 1, "t3"), ("c", 2, "t2")]


def test_stale_update_loses_to_tombstone(spark):
    ch = _changes(
        spark,
        [
            ("insert", 1, 1, "c", 1, None),
            ("update", 5, 5, "c", 2, 1),  # move 1 -> 2 at ts=5
            ("update", 3, 3, "c", 1, None),  # stale write at old key, ts=3
        ],
    )
    exp = expand_key_changes(ch, {"turn_idx": "old_turn_idx"})
    assert _final(exp) == [("c", 2, "t5")]


def test_single_scan_plan(spark):
    ch = _changes(spark, [("insert", 1, 1, "c", 1, None)])
    exp = expand_key_changes(ch, {"turn_idx": "old_turn_idx"})
    plan = exp._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan  # one projection + Generate, not 2 scans
    assert "Generate" in plan
