"""Event-time disorder / watermark advisor: the two-pass distributed
prefix scan must equal the naive global-window formulation exactly,
for any range count, and never plan a single-partition global window."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Window, functions as F

from embulk_util_json_spark.pipeline.disorder import disorder_summary


def _ts(s):
    return datetime.datetime(2024, 3, 1, 10, 0, s)


def _stream(spark):
    # delivery order 0..5; event times: 0 late by 0, 1 jumps ahead,
    # 2 is 3 s late, 3 on time, 4 is 1 s late, 5 ahead
    rows = [
        (0, _ts(10)),
        (1, _ts(15)),
        (2, _ts(12)),  # late by 3 s
        (3, _ts(15)),  # ties the high-water mark: not late
        (4, _ts(14)),  # late by 1 s
        (5, _ts(20)),
    ]
    return spark.createDataFrame(rows, "seq long, ts timestamp")


def test_known_disorder_values(spark):
    s = disorder_summary(_stream(spark), n_ranges=3).collect()[0]
    assert (s.n_events, s.n_late) == (6, 2)
    assert s.max_lateness_sec == 3.0
    assert s.watermark_sec == 3
    assert abs(s.frac_late - 2 / 6) < 1e-12
    assert abs(s.mean_lateness_sec - 4 / 6) < 1e-12


@pytest.mark.parametrize("n_ranges", [1, 2, 7, 100])
def test_distributed_scan_equals_naive_window(spark, sf_smoke_dir, n_ranges):
    ev = spark.read.parquet(f"{sf_smoke_dir}/events.parquet").select(
        F.col("event_id").alias("seq"),
        # the table is time-ordered; inject deterministic disorder so
        # the equivalence is non-trivial
        F.timestamp_micros(
            F.unix_micros(F.col("ts").cast("timestamp"))
            - (F.col("event_id") % 53) * F.lit(1_000_000)
        ).alias("ts"),
    )
    got = disorder_summary(ev, n_ranges=n_ranges).collect()[0]
    w = Window.orderBy("seq").rowsBetween(Window.unboundedPreceding, 0)
    late = F.unix_micros(F.max("ts").over(w)) - F.unix_micros(F.col("ts"))
    naive = ev.select(late.alias("l")).agg(
        F.count(F.lit(1)), F.sum(F.when(F.col("l") > 0, 1).otherwise(0)),
        F.max("l"), F.sum("l"),
    ).collect()[0]
    assert got.n_events == naive[0]
    assert got.n_late == naive[1]
    assert got.max_lateness_sec == naive[2] / 1e6
    assert abs(got.mean_lateness_sec - naive[3] / naive[0] / 1e6) < 1e-9


def test_null_ts_excluded_and_empty_ok(spark):
    rows = [(0, None), (1, None)]
    df = spark.createDataFrame(rows, "seq long, ts timestamp")
    s = disorder_summary(df).collect()[0]
    assert s.n_events == 0


def test_no_global_single_partition_window(spark):
    """The 100 TB guard: the plan's window must be partitioned (by the
    range id), never a global ORDER BY seq window."""
    plan = (
        disorder_summary(_stream(spark), n_ranges=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "windowspecdefinition(_rid" in plan


# ---- binlog continuity (seq_gaps / seq_continuity_summary) ----------


def _gaps(spark, seqs, n_ranges):
    from embulk_util_json_spark.pipeline.disorder import seq_gaps

    df = spark.createDataFrame([(s,) for s in seqs], "seq long")
    return [
        (r.gap_start, r.gap_end, r.n_missing)
        for r in seq_gaps(df, "seq", n_ranges=n_ranges).collect()
    ]


@pytest.mark.parametrize("n_ranges", [1, 3, 64])
def test_seq_gaps_exact_for_any_range_count(spark, n_ranges):
    # holes: single (4), multi (7-9), and one spanning many ranges
    # (20-99) — the spanning hole empties whole ranges and must come
    # out as ONE stitched gap, not per-range fragments
    seqs = [1, 2, 3, 5, 6, 10, 11, 100, 101]
    want = [(4, 4, 1), (7, 9, 3), (12, 99, 88)]
    assert _gaps(spark, seqs, n_ranges) == want


def test_seq_gaps_duplicates_never_fake_gaps(spark):
    assert _gaps(spark, [1, 1, 2, 2, 2, 3], 4) == []
    assert _gaps(spark, [1, 1, 3, 3], 4) == [(2, 2, 1)]


def test_seq_gaps_empty_and_single(spark):
    assert _gaps(spark, [], 8) == []
    assert _gaps(spark, [42], 8) == []


def test_seq_continuity_summary_counts(spark):
    from embulk_util_json_spark.pipeline.disorder import seq_continuity_summary

    df = spark.createDataFrame(
        [(s,) for s in [1, 1, 2, 5, 6, 6, 6, 9]], "seq long"
    )
    r = seq_continuity_summary(df, "seq", n_ranges=4).collect()[0]
    assert (r.n_rows, r.n_distinct, r.lo, r.hi) == (8, 5, 1, 9)
    assert r.n_dup_rows == 3  # one extra 1, two extra 6s
    assert (r.n_gaps, r.n_missing) == (2, 4)  # gaps 3-4 and 7-8


# ---- in-order commit fencing (fence_at_first_gap) -------------------


def _fence(spark, seqs, n_ranges=4):
    from embulk_util_json_spark.pipeline.disorder import fence_at_first_gap

    df = spark.createDataFrame([(s,) for s in seqs], "seq long")
    return sorted(
        r.seq for r in fence_at_first_gap(df, "seq", n_ranges=n_ranges).collect()
    )


def test_fence_holds_back_everything_past_first_gap(spark):
    # first hole at 6-7: events 8..10 are held back even though later
    # positions are contiguous again — the sink must never reflect a
    # suffix of the log while missing part of its prefix
    assert _fence(spark, [1, 2, 3, 4, 5, 8, 9, 10]) == [1, 2, 3, 4, 5]


def test_fence_no_gap_passes_everything(spark):
    assert _fence(spark, [3, 4, 5, 6]) == [3, 4, 5, 6]
    # duplicates are redelivery, not holes
    assert _fence(spark, [1, 1, 2, 2, 3]) == [1, 1, 2, 2, 3]


def test_fence_multiple_gaps_uses_first(spark):
    assert _fence(spark, [1, 3, 5]) == [1]


def test_fence_empty_ok(spark):
    assert _fence(spark, []) == []


def test_fence_keeps_payload_columns(spark):
    from embulk_util_json_spark.pipeline.disorder import fence_at_first_gap

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (4, "held")], "seq long, payload string"
    )
    out = fence_at_first_gap(df, "seq").collect()
    assert sorted((r.seq, r.payload) for r in out) == [(1, "a"), (2, "b")]
    assert "_fence" not in fence_at_first_gap(df, "seq").columns


# ---- replica freshness (replication_lag_summary) --------------------


def _lag_stream(spark):
    import datetime

    base = datetime.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (1, "k1", base),
        (2, "k2", base + datetime.timedelta(seconds=10)),
        (3, "k1", base + datetime.timedelta(seconds=20)),
        (4, "k3", base + datetime.timedelta(seconds=40)),
        (5, "k3", base + datetime.timedelta(seconds=30)),
        (6, "k4", base + datetime.timedelta(seconds=60)),
    ]
    return spark.createDataFrame(rows, "seq long, k string, ts timestamp")


def test_replication_lag_known_values(spark):
    from embulk_util_json_spark.pipeline.disorder import replication_lag_summary

    r = replication_lag_summary(
        _lag_stream(spark), 3, key_cols=["k"]
    ).collect()[0]
    assert r.applied_hwm_seq == 3
    assert r.n_pending == 3
    assert r.n_keys_pending == 2  # k3, k4
    assert r.applied_hwm_ts.second == 20
    assert r.source_hwm_ts.second == 0 and r.source_hwm_ts.minute == 1
    assert r.lag_sec == 40.0


def test_replication_lag_caught_up_is_zero(spark):
    from embulk_util_json_spark.pipeline.disorder import replication_lag_summary

    r = replication_lag_summary(
        _lag_stream(spark), 100, key_cols=["k"]
    ).collect()[0]
    assert (r.n_pending, r.n_keys_pending, r.lag_sec) == (0, 0, 0.0)
    assert r.applied_hwm_seq == 6


def test_replication_lag_single_aggregation_plan(spark):
    """One pass: the plan must contain exactly one pair of hash
    aggregates (partial + final for the distinct) and no window —
    freshness monitoring must stay O(1) memory per partition."""
    from embulk_util_json_spark.pipeline.disorder import replication_lag_summary

    plan = (
        replication_lag_summary(_lag_stream(spark), 3, key_cols=["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
