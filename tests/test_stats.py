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
