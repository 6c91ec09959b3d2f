"""Per-column merge policies (operators/lww.policy_agg): mixed
policies reduce in ONE hash aggregation; all-lww degenerates to
lww_agg; sum/first/count match hand-computed values; unknown policy
names fail loudly."""

import pytest
from pyspark.sql import functions as F

from embulk_util_json_spark.operators.lww import lww_agg, policy_agg


def _changes(spark):
    rows = [
        # (op, ts, seq, conv_id, turn_idx, text)
        ("insert", "2024-01-01 00:00:01", 1, "a", 0, "xx"),
        ("update", "2024-01-01 00:00:05", 2, "a", 0, "yyyy"),
        ("update", "2024-01-01 00:00:03", 3, "a", 0, "z"),  # older ts, later seq
        ("insert", "2024-01-01 00:00:02", 4, "b", 0, "kkk"),
        ("delete", "2024-01-01 00:00:09", 5, "b", 0, ""),
    ]
    return spark.createDataFrame(
        rows, "op string, ts string, seq long, conv_id string, turn_idx int, text string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_mixed_policies_hand_checked(spark):
    df = _changes(spark).select(
        "*",
        F.length("text").cast("long").alias("tokens"),
        F.col("ts").alias("first_ts"),
    )
    out = {
        (r.conv_id, r.turn_idx): r
        for r in policy_agg(
            df,
            ["conv_id", "turn_idx"],
            ["ts", "seq"],
            {
                "text": "lww",
                "ts": "lww",
                "tokens": "sum",
                "first_ts": "first",
                "n_events": "count",
            },
        ).collect()
    }
    a = out[("a", 0)]
    assert a.text == "yyyy"          # LWW by ts (seq 3 is older-ts)
    assert a.tokens == 2 + 4 + 1     # sum over ALL deliveries
    assert a.first_ts.second == 1    # first writer
    assert a.n_events == 3
    assert a.op == "update"
    b = out[("b", 0)]
    assert b.op == "delete"          # tombstone still decided by LWW


def test_all_lww_equals_lww_agg(spark):
    df = _changes(spark)
    pol = policy_agg(
        df, ["conv_id", "turn_idx"], ["ts", "seq"],
        {"text": "lww", "ts": "lww", "seq": "lww"},
    ).select("conv_id", "turn_idx", "op", "ts", "seq", "text")
    ref = lww_agg(df, ["conv_id", "turn_idx"], ["ts", "seq"]).select(
        "conv_id", "turn_idx", "op", "ts", "seq", "text"
    )
    assert sorted(map(tuple, pol.collect())) == sorted(map(tuple, ref.collect()))


def test_single_exchange_plan(spark):
    df = _changes(spark).withColumn("tokens", F.length("text").cast("long"))
    out = policy_agg(
        df, ["conv_id", "turn_idx"], ["ts", "seq"],
        {"text": "lww", "tokens": "sum", "n": "count"},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one shuffle for every policy at once


def test_unknown_policy_raises(spark):
    with pytest.raises(ValueError, match="unknown merge policy"):
        policy_agg(_changes(spark), ["conv_id"], ["ts", "seq"], {"text": "avg"})
