"""Partition-spec evolution for the time-partitioned lake export
(``pipeline/export.export_time_partitioned`` /
``read_time_sliced_evolved``).

Contract under test: old data keeps its old layout (day) while new
data lands under the evolved spec (hour); a windowed read plans each
generation under its own transform, prunes directories in both, and
the union equals the exact row predicate over everything written.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from embulk_util_json_spark.pipeline.export import (
    export_time_partitioned,
    read_time_sliced_evolved,
)

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _rows(spark, n, start, step_minutes):
    data = [
        (i, start + datetime.timedelta(minutes=step_minutes * i)) for i in range(n)
    ]
    return spark.createDataFrame(data, "id long, ts timestamp")


def test_evolved_layout_and_exact_window(spark, tmp_path):
    path = str(tmp_path / "evo")
    early = _rows(spark, 96, T0, 60)                      # 4 days, hourly rows
    late_start = T0 + datetime.timedelta(days=4)
    late = _rows(spark, 48, late_start, 30)               # 1 day, half-hourly
    export_time_partitioned(early, path, "day")
    export_time_partitioned(late, path, "hour")
    assert sorted(os.listdir(path)) == ["spec=day", "spec=hour"]
    # day generation kept its day dirs; hour generation got hour dirs
    assert any(d.startswith("_day=") for d in os.listdir(f"{path}/spec=day"))
    assert any(d.startswith("_hour=") for d in os.listdir(f"{path}/spec=hour"))

    since = T0 + datetime.timedelta(days=2)
    until = late_start + datetime.timedelta(hours=6)
    got = read_time_sliced_evolved(spark, path, since=since, until=until)
    expect = (
        early.unionByName(late)
        .filter((F.col("ts") >= F.lit(since)) & (F.col("ts") < F.lit(until)))
    )
    assert sorted(r.id for r in got.collect()) == sorted(
        r.id for r in expect.collect()
    )
    assert "ts" in got.columns and "_day" not in got.columns


def test_both_generations_prune(spark, tmp_path):
    path = str(tmp_path / "evo")
    early = _rows(spark, 96, T0, 60)
    late_start = T0 + datetime.timedelta(days=4)
    late = _rows(spark, 48, late_start, 30)
    export_time_partitioned(early, path, "day")
    export_time_partitioned(late, path, "hour")
    since = T0 + datetime.timedelta(days=2)
    until = late_start + datetime.timedelta(hours=6)
    sliced = read_time_sliced_evolved(spark, path, since=since, until=until)
    full = read_time_sliced_evolved(spark, path)

    def files(df, sub):
        return (
            df.select(F.input_file_name().alias("f"))
            .filter(F.col("f").contains(sub))
            .distinct()
            .count()
        )

    for sub in ("spec=day", "spec=hour"):
        assert 0 < files(sliced, sub) < files(full, sub), sub


def test_open_bounds_and_unknown_granularity(spark, tmp_path):
    path = str(tmp_path / "evo")
    export_time_partitioned(_rows(spark, 10, T0, 60), path, "day")
    # open until: everything from since on
    got = read_time_sliced_evolved(
        spark, path, since=T0 + datetime.timedelta(hours=5)
    )
    assert got.count() == 5
    try:
        export_time_partitioned(_rows(spark, 1, T0, 1), path, "week")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "granularity" in str(e)
