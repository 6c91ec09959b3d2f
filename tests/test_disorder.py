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
