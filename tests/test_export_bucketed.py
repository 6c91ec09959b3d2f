"""Bucketed warehouse export (``export_bucketed``).

Contract under test: exporting sink state through Spark's native
``bucketBy`` makes the partitioning visible to Catalyst, so
- two exports with the same bucket count JOIN on the bucket key with
  zero Exchange on either side (bucketed sort-merge join),
- a per-key aggregation over one export also plans without its
  exchange,
- values stay bit-equal to ``sink.read()``,
- the table is EXTERNAL: re-export refreshes in place, DROP TABLE
  keeps the data files.
"""

from __future__ import annotations

import glob
import os
import uuid

from pyspark.sql import functions as F

from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
from embulk_util_json_spark.sources.events import parse_change_events


def _changes(spark, lo, hi):
    rows = [
        (
            i,
            '{"op":"insert","ts":"2024-01-01 00:%02d:%02d.%06d","data":{"conv_id":"c%d",'
            '"turn_idx":%d,"role":"user","text":"t-%d","tool":null}}'
            % (i // 60, i % 60, i, i % 13, i % 5, i),
        )
        for i in range(lo, hi)
    ]
    return parse_change_events(
        spark.createDataFrame(rows, "seq long, event_json string")
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_export_matches_read_and_join_is_shuffle_free(spark, tmp_path):
    tag = uuid.uuid4().hex[:8]
    a = ParquetSnapshotSink(spark, str(tmp_path / "a"), num_buckets=4, mode="mor")
    a.apply(_changes(spark, 0, 150), "b0")
    conv = ParquetSnapshotSink(
        spark, str(tmp_path / "c"), num_buckets=4, keys=["conv_id"], mode="mor"
    )
    conv.apply(_changes(spark, 0, 150), "b0")
    ta = a.export_bucketed(f"texp_a_{tag}", str(tmp_path / "exp_a"))
    tc = conv.export_bucketed(f"texp_c_{tag}", str(tmp_path / "exp_c"))

    exported = sorted(map(tuple, spark.table(ta).select(*a.read().columns).collect()))
    assert exported == sorted(map(tuple, a.read().collect()))

    dim = spark.table(tc).select("conv_id", F.col("text").alias("last_text"))
    j = spark.table(ta).hint("merge").join(dim, "conv_id")
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    naive = a.read().join(
        conv.read().select("conv_id", F.col("text").alias("last_text")), "conv_id"
    )
    assert sorted(map(tuple, j.select(*naive.columns).collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_groupby_over_export_skips_exchange(spark, tmp_path):
    tag = uuid.uuid4().hex[:8]
    a = ParquetSnapshotSink(spark, str(tmp_path / "a"), num_buckets=4)
    a.apply(_changes(spark, 0, 150), "b0")
    ta = a.export_bucketed(f"texp_g_{tag}", str(tmp_path / "exp"))
    agg = spark.table(ta).groupBy("conv_id").agg(F.count("*").alias("n"))
    assert "Exchange" not in _plan(agg)
    got = {r.conv_id: r.n for r in agg.collect()}
    want = {
        r.conv_id: r.n
        for r in a.read().groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_reexport_refreshes_and_drop_keeps_files(spark, tmp_path):
    tag = uuid.uuid4().hex[:8]
    a = ParquetSnapshotSink(spark, str(tmp_path / "a"), num_buckets=4, mode="mor")
    a.apply(_changes(spark, 0, 60), "b0")
    name = a.export_bucketed(f"texp_r_{tag}", str(tmp_path / "exp"))
    n0 = spark.table(name).count()
    a.apply(_changes(spark, 60, 200), "b1")
    a.export_bucketed(name, str(tmp_path / "exp"))  # overwrite refresh
    assert spark.table(name).count() == a.read().count() > n0
    spark.sql(f"DROP TABLE {name}")
    # external table: data files survive the catalog drop
    assert glob.glob(str(tmp_path / "exp" / "**" / "*.parquet"), recursive=True)
