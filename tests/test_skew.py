"""Skew advisor: hot-key histogram, stream-shape summary, salt
planning — and the contract that the recommended salt actually feeds
the salted LWW without changing results."""

from __future__ import annotations

from pyspark.sql import functions as F

from embulk_util_json_spark.operators.lww import lww_agg, lww_salted
from embulk_util_json_spark.pipeline.skew import (
    key_histogram,
    recommended_salt_buckets,
    skew_summary,
)


def _skewed_df(spark):
    # 90 rows on one conversation, 10 singletons
    rows = [("hot", i, f"p{i}") for i in range(90)] + [
        (f"k{i}", 100 + i, f"q{i}") for i in range(10)
    ]
    return spark.createDataFrame(rows, "conv_id string, seq long, payload string")


def test_key_histogram_counts_share_salt(spark):
    h = {r.conv_id: r for r in key_histogram(
        _skewed_df(spark), ["conv_id"], top_k=3, parallelism=10
    ).collect()}
    assert h["hot"].n_rows == 90 and h["hot"].rank == 1
    assert abs(h["hot"].share - 0.9) < 1e-12
    assert h["hot"].salt == 9  # ceil(90·10/100)
    # ties at the boundary break by key, deterministically
    assert sorted(k for k in h if k != "hot") == ["k0", "k1"]
    assert all(h[k].salt == 1 for k in h if k != "hot")


def test_skew_summary_shape(spark):
    s = skew_summary(_skewed_df(spark), ["conv_id"]).collect()[0]
    assert (s.n_rows, s.n_keys, s.max_key_rows) == (100, 11, 90)
    assert abs(s.hot_ratio - 90 * 11 / 100) < 1e-12


def test_recommended_salt_feeds_lww_salted(spark):
    df = _skewed_df(spark)
    s = recommended_salt_buckets(df, ["conv_id"], parallelism=10)
    assert s == 9
    base = lww_agg(df, ["conv_id"], ["seq"]).collect()
    salted = lww_salted(df, ["conv_id"], ["seq"], salt_buckets=s).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, salted))


def test_uniform_stream_recommends_no_salting(spark):
    rows = [(f"k{i % 20}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "conv_id string, seq long")
    assert recommended_salt_buckets(df, ["conv_id"], parallelism=20) == 1


def test_topk_is_take_ordered_not_global_sort(spark):
    """The top-k must plan as TakeOrderedAndProject (per-partition
    heap + driver merge of k rows) — a global sort of all per-key
    counts (one row per distinct key; billions at 100 TB) through one
    task would be the scale bottleneck. The ranking window may only
    run ABOVE the TakeOrdered, where its input is ≤ top_k rows by
    construction (physical plans print parent-first, so the Window
    node must appear before TakeOrderedAndProject in the string)."""
    plan = (
        key_histogram(_skewed_df(spark), ["conv_id"], top_k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    if "Window" in plan:
        assert plan.index("Window") < plan.index("TakeOrderedAndProject")


def test_total_branch_reuses_grouped_exchange(spark, sf_smoke_dir):
    """On the file-backed path the 1-row total aggregate reuses the
    grouped exchange at runtime (AQE) instead of rescanning the
    events."""
    ev = spark.read.parquet(f"{sf_smoke_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("conv_id")
    )
    h = key_histogram(ev, ["conv_id"], top_k=5)
    h.collect()
    assert "ReusedExchange" in h._jdf.queryExecution().executedPlan().toString()
