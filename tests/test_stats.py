"""Column statistics (pipeline/stats.column_stats): one-scan ANALYZE
with exact NDV, COUNT-based null counting (BIGINT twin — no HUGEINT),
and native-typed min/max rendered to strings after aggregation."""

import datetime as dt

import pytest

from embulk_util_json_spark.pipeline.stats import column_stats


def _df(spark):
    t = dt.datetime
    return spark.createDataFrame(
        [
            ("a", 2, None, t(2024, 1, 1, 10, 0, 0, 123456)),
            ("b", 10, "x", t(2024, 1, 2, 10, 0, 0)),
            ("a", 2, "y", t(2024, 1, 3, 10, 0, 0, 7)),
        ],
        "k string, n int, s string, ts timestamp",
    )


def test_stats_values_and_rendering(spark):
    got = {r.column: r for r in column_stats(_df(spark)).collect()}
    assert set(got) == {"k", "n", "s", "ts"}
    assert all(r.n_rows == 3 for r in got.values())
    assert (got["s"].n_nulls, got["s"].n_distinct) == (1, 2)
    assert (got["k"].n_nulls, got["k"].n_distinct) == (0, 2)
    # numeric min/max computed natively, not lexicographically
    assert (got["n"].min_value, got["n"].max_value) == ("2", "10")
    # fixed-width microsecond rendering
    assert got["ts"].min_value == "2024-01-01 10:00:00.123456"
    assert got["ts"].max_value == "2024-01-03 10:00:00.000007"


def test_stats_column_subset_and_unknown(spark):
    df = _df(spark)
    assert [r.column for r in column_stats(df, ["n"]).collect()] == ["n"]
    with pytest.raises(ValueError, match="no such column"):
        column_stats(df, ["nope"])


def test_stats_approx_mode_runs(spark):
    got = {r.column: r for r in column_stats(_df(spark), exact=False).collect()}
    # approx NDV on 3 rows is exact in practice; pin the contract loosely
    assert got["k"].n_distinct >= 1


def test_numeric_quantiles_exact_interpolation(spark):
    """Exact percentile = SQL-standard PERCENTILE_CONT linear
    interpolation: for [1,2,3,4] p50 = 2.5, p25 = 1.75; NULLs
    ignored."""
    from embulk_util_json_spark.pipeline.stats import numeric_quantiles

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (4.0,), (None,)], "v double"
    )
    (r,) = numeric_quantiles(df, ["v"], probs=(0.25, 0.5, 1.0)).collect()
    assert (r.column, r.p25, r.p50, r.p100) == ("v", 1.75, 2.5, 4.0)


def test_numeric_quantiles_rejects_non_numeric(spark):
    from embulk_util_json_spark.pipeline.stats import numeric_quantiles

    df = spark.createDataFrame([("x", 1)], "s string, n int")
    try:
        numeric_quantiles(df, ["s"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "not numeric" in str(e)


def test_numeric_quantiles_approx_knob_same_shape(spark):
    """exact=False swaps in the bounded-memory sketch; same schema,
    and on tiny input with high accuracy the approx answer lands on a
    real data value near the rank (no exactness claim)."""
    from embulk_util_json_spark.pipeline.stats import numeric_quantiles

    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    (r,) = numeric_quantiles(df, ["v"], probs=(0.5,), exact=False).collect()
    assert r.column == "v" and 49.0 <= r.p50 <= 52.0


def test_numeric_quantiles_single_aggregate_plan(spark):
    """All (column, prob) cells ride ONE hash aggregation — the plan
    contains a single pair of HashAggregate/SortAggregate stages, no
    join, no window."""
    from embulk_util_json_spark.pipeline.stats import numeric_quantiles_sql

    # plan shape is pinned on the Spark side implicitly by the single
    # .agg() call; here pin the oracle twin renders one SELECT per
    # column with quantile_cont cells
    sql = numeric_quantiles_sql("SELECT 1 AS a, 2 AS b", ["a", "b"])
    assert sql.count("UNION ALL") == 1
    assert sql.count("quantile_cont") == 8
