"""Row lineage (`track_lineage=True`, the Delta row-tracking shape
made explicit): every change row is stamped with its writer batch id
at apply; the LWW winner carries exact "which batch last wrote this
row" provenance as an ordinary payload column, so it survives
compaction (rewrites rows, does not re-WIN them), time travel, and
change feeds. Batch id rather than version deliberately: known before
the OCC commit race resolves, so retries stamp identically;
`lineage()` maps batch → version/metrics.

Reference anchor: the reference has no storage layer; this is the
row-level complement of the engine's per-(apply,bucket) lineage
(SURVEY §2.4 apply metrics).
"""

import datetime

import pytest
from pyspark.sql import functions as F

from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink


def _rows(spark, lo, hi, shift=0):
    out = [
        (
            f"c{i % 4}",
            i % 6,
            "assistant",
            f"text {i + shift}",
            datetime.datetime(2025, 1, 1) + datetime.timedelta(seconds=i + shift),
            "upsert",
            i + shift,
        )
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        out,
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, op string, seq long",
    )


def _mk(spark, tmp_path, **kw):
    return ParquetSnapshotSink(
        spark,
        str(tmp_path / "t"),
        num_buckets=4,
        keys=["conv_id", "turn_idx"],
        order_cols=["ts", "seq"],
        mode="mor",
        track_lineage=True,
        **kw,
    )


def test_winner_carries_its_writer_batch(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.apply(_rows(spark, 0, 24), "b0")
    sink.apply(_rows(spark, 12, 18, shift=100), "b1")  # later ts: b1 wins its keys
    got = {
        (r.conv_id, r.turn_idx): r._ingest_batch
        for r in sink.read().select("conv_id", "turn_idx", "_ingest_batch").collect()
    }
    # keys derive from i alone; shift only advances ts/seq (so b1's
    # re-writes of keys 12..17 carry strictly later order columns)
    b1_keys = {(f"c{i % 4}", i % 6) for i in range(12, 18)}
    assert any(k not in b1_keys for k in got), "need surviving b0 rows"
    for k, b in got.items():
        assert b == ("b1" if k in b1_keys else "b0"), (k, b)


def test_lineage_survives_compaction_and_time_travel(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.apply(_rows(spark, 0, 24), "b0")
    v1 = sink.current_version()
    sink.apply(_rows(spark, 12, 24, shift=100), "b1")
    before = sorted(
        map(tuple, sink.read().select("conv_id", "turn_idx", "_ingest_batch").collect())
    )
    sink.compact()
    after = sorted(
        map(tuple, sink.read().select("conv_id", "turn_idx", "_ingest_batch").collect())
    )
    assert before == after
    # time travel: as of v1 every row is b0's
    tt = sink.read(at_version=v1).select("_ingest_batch").distinct().collect()
    assert [r._ingest_batch for r in tt] == ["b0"]


def test_lineage_is_table_state_adopted_by_later_handles(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.apply(_rows(spark, 0, 12), "b0")
    # a second handle constructed WITHOUT the flag must adopt it from
    # the manifest and keep stamping
    plain = ParquetSnapshotSink(
        spark,
        str(tmp_path / "t"),
        num_buckets=4,
        keys=["conv_id", "turn_idx"],
        order_cols=["ts", "seq"],
        mode="mor",
    )
    assert plain.track_lineage
    plain.apply(_rows(spark, 0, 12, shift=1000), "b1")
    got = plain.read().select("_ingest_batch").distinct().collect()
    assert {r._ingest_batch for r in got} == {"b1"}


def test_change_feed_shows_deleting_batch(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.apply(_rows(spark, 0, 12), "b0")
    v1 = sink.current_version()
    dele = _rows(spark, 0, 4, shift=2000).withColumn("op", F.lit("delete"))
    sink.apply(dele, "b-del")
    feed = sink.read_changes(from_version=v1)
    dels = feed.filter("op = 'delete'").select("_ingest_batch").distinct().collect()
    assert {r._ingest_batch for r in dels} == {"b-del"}


def test_producer_supplied_lineage_is_overwritten(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    forged = _rows(spark, 0, 8).withColumn("_ingest_batch", F.lit("forged"))
    sink.apply(forged, "b0")
    got = sink.read().select("_ingest_batch").distinct().collect()
    assert {r._ingest_batch for r in got} == {"b0"}


def test_patch_mode_refuses_row_lineage(spark, tmp_path):
    with pytest.raises(ValueError, match="patch mode"):
        ParquetSnapshotSink(
            spark,
            str(tmp_path / "p"),
            num_buckets=4,
            keys=["conv_id", "turn_idx"],
            order_cols=["ts", "seq"],
            patch_cols=["text"],
            track_lineage=True,
        )
