"""Before-image conflict detection (operators/integrity.py): clean
streams audit silent, drifted images flag with the right reason and
expected values, inserts and image-less rows are never audited, and
the audit window is key-partitioned (no global window)."""

import datetime

import pytest
from pyspark.sql import Row

from embulk_util_json_spark.operators.integrity import (
    detect_before_image_conflicts,
)

KEYS = ["conv_id", "turn_idx"]
ORDER = ["ts", "seq"]
BEFORE = {"text": "before_text", "tool": "before_tool"}


def _ts(s):
    return datetime.datetime(2026, 1, 1, 0, 0, s)


def _df(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                op=op,
                ts=_ts(sec),
                seq=seq,
                conv_id="c",
                turn_idx=1,
                text=text,
                tool=tool,
                before_text=bt,
                before_tool=bo,
            )
            for (op, sec, seq, text, tool, bt, bo) in rows
        ],
        "op string, ts timestamp, seq long, conv_id string, turn_idx int, "
        "text string, tool string, before_text string, before_tool string",
    )


def _conflicts(df):
    ann = detect_before_image_conflicts(df, KEYS, ORDER, BEFORE)
    return {
        r.seq: (r.conflict_reason, r.expected_text)
        for r in ann.filter("conflict").collect()
    }


def test_clean_stream_is_silent(spark):
    df = _df(
        spark,
        [
            ("insert", 1, 1, "a", "x", None, None),
            ("update", 2, 2, "b", "x", "a", "x"),
            ("update", 3, 3, "c", "y", "b", "x"),
            ("delete", 4, 4, "c", "y", "c", "y"),
        ],
    )
    assert _conflicts(df) == {}


def test_mismatch_flagged_with_expected(spark):
    df = _df(
        spark,
        [
            ("insert", 1, 1, "a", "x", None, None),
            # claims the row said "z" before -- it said "a"
            ("update", 2, 2, "b", "x", "z", "x"),
        ],
    )
    assert _conflicts(df) == {2: ("mismatch", "a")}


def test_no_predecessor_flagged(spark):
    df = _df(spark, [("update", 1, 1, "b", "x", "a", "x")])
    assert _conflicts(df) == {1: ("no_predecessor", None)}


def test_insert_never_audited(spark):
    # an insert carrying a (bogus) before image is out of scope
    df = _df(spark, [("insert", 1, 1, "a", "x", "junk", "junk")])
    assert _conflicts(df) == {}


def test_null_image_skipped(spark):
    # REPLICA IDENTITY DEFAULT: update ships no before image at all
    df = _df(
        spark,
        [
            ("insert", 1, 1, "a", "x", None, None),
            ("update", 2, 2, "b", "y", None, None),
        ],
    )
    assert _conflicts(df) == {}


def test_partial_image_column_compared(spark):
    # only tool drifts; text matches -> still a mismatch conflict
    df = _df(
        spark,
        [
            ("insert", 1, 1, "a", "x", None, None),
            ("update", 2, 2, "b", "y", "a", "WRONG"),
        ],
    )
    assert _conflicts(df) == {2: ("mismatch", "a")}


def test_window_is_key_partitioned(spark):
    df = _df(spark, [("insert", 1, 1, "a", "x", None, None)])
    ann = detect_before_image_conflicts(df, KEYS, ORDER, BEFORE)
    plan = ann._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # every Window node must carry a partition spec (no global funnel)
    for line in plan.splitlines():
        if "Window [" in line or line.strip().startswith("Window"):
            assert "conv_id" in line
