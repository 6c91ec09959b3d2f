"""Incremental join view (pipeline/join_view.py): the maintained
L ⋈ R must equal the from-scratch join at every refresh point, right-
side changes propagate to every pointing left row, deletes on either
side retire view rows (inner) or null the right columns (left join),
refresh is idempotent/redelivery-safe, and join-shape violations are
rejected at construction."""

import datetime

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from embulk_util_json_spark.pipeline.join_view import (
    IncrementalJoinView,
    last_folded_versions,
)
from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
from embulk_util_json_spark.sources.events import parse_change_events
from embulk_util_json_spark.sources.generator import generate_events
from embulk_util_json_spark.streaming.runner import apply_events_batch

N = 3000
R_SCHEMA = "conv_id string, plan string, op string, ts timestamp, seq long"


@pytest.fixture(scope="module")
def ev_parquet(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("joinview") / "events.parquet")
    pq.write_table(generate_events(N, n_convs=30, n_turns=20), path)
    return path


def _right_sink(spark, path):
    return ParquetSnapshotSink(
        spark, path, num_buckets=4, keys=["conv_id"], order_cols=["ts", "seq"]
    )


def _rrow(seq, op, conv, plan, sec):
    return (conv, plan, op, datetime.datetime(2026, 1, 1, 0, 0, sec), seq)


def _recompute(left, right, how):
    r = right.read().select(
        "conv_id",
        *[F.col(c).alias(f"r_{c}") for c in right.read().columns if c != "conv_id"],
    )
    j = left.read().join(r, "conv_id", how)
    return sorted(tuple(row) for row in j.select(sorted(j.columns)).collect())


def _view(jv):
    df = jv.read()
    return sorted(tuple(row) for row in df.select(sorted(df.columns)).collect())


def test_fold_equals_recompute_both_hows(spark, ev_parquet, tmp_path):
    ev = spark.read.parquet(ev_parquet)
    # right profile stream derived from the same events: LWW latest
    # plan per conversation, deletes tombstone the profile
    prof = parse_change_events(ev).select(
        "conv_id", F.col("role").alias("plan"), "op", "ts", "seq"
    )
    for how in ("inner", "left"):
        left = ParquetSnapshotSink(spark, str(tmp_path / f"l_{how}"), num_buckets=4)
        right = _right_sink(spark, str(tmp_path / f"r_{how}"))
        jv = IncrementalJoinView(
            spark, str(tmp_path / f"v_{how}"), left, right, ["conv_id"], how=how
        )
        steps = [
            ("l", 0, 1000), ("r", 0, 1500), ("l", 1000, 2000),
            ("r", 1500, N), ("l", 2000, N),
        ]
        for i, (side, a, b) in enumerate(steps):
            cut = (F.col("seq") >= a) & (F.col("seq") < b)
            if side == "l":
                apply_events_batch(ev.filter(cut), left, f"b{i}")
            else:
                right.apply(prof.filter(cut), f"rb{i}")
            assert not jv.refresh().get("skipped")
            assert _view(jv) == _recompute(left, right, how), (how, i)


def test_right_change_propagates_and_deletes_retire(spark, tmp_path):
    left = ParquetSnapshotSink(spark, str(tmp_path / "l"), num_buckets=2)
    right = _right_sink(spark, str(tmp_path / "r"))
    jv = IncrementalJoinView(spark, str(tmp_path / "v"), left, right, ["conv_id"])
    mk_l = lambda rs: spark.createDataFrame(rs, "seq long, event_json string")
    ins = lambda seq, conv, turn, sec: (
        seq,
        f'{{"op":"insert","ts":"2026-01-01 00:00:{sec:02d}.000000",'
        f'"data":{{"conv_id":"{conv}","turn_idx":{turn},"role":"r",'
        f'"text":"t{seq}","tool":"x"}}}}',
    )
    apply_events_batch(mk_l([ins(0, "a", 1, 1), ins(1, "a", 2, 2), ins(2, "b", 1, 3)]), left, "b1")
    right.apply(
        spark.createDataFrame([_rrow(0, "insert", "a", "free", 1),
                               _rrow(1, "insert", "b", "free", 2)], R_SCHEMA),
        "rb1",
    )
    jv.refresh()
    got = {(r.conv_id, r.turn_idx): r.r_plan for r in jv.read().collect()}
    assert got == {("a", 1): "free", ("a", 2): "free", ("b", 1): "free"}
    # right UPDATE propagates to every pointing left row; right DELETE
    # retires all of that conversation's view rows (inner join)
    right.apply(
        spark.createDataFrame([_rrow(2, "update", "a", "pro", 3),
                               _rrow(3, "delete", "b", "free", 4)], R_SCHEMA),
        "rb2",
    )
    jv.refresh()
    got = {(r.conv_id, r.turn_idx): r.r_plan for r in jv.read().collect()}
    assert got == {("a", 1): "pro", ("a", 2): "pro"}
    # left DELETE retires its view row without touching siblings
    apply_events_batch(
        mk_l([(3, '{"op":"delete","ts":"2026-01-01 00:00:05.000000",'
                  '"data":{"conv_id":"a","turn_idx":1,"role":"r",'
                  '"text":"t0","tool":"x"}}')]),
        left, "b2",
    )
    jv.refresh()
    got = {(r.conv_id, r.turn_idx): r.r_plan for r in jv.read().collect()}
    assert got == {("a", 2): "pro"}


def test_left_join_keeps_unmatched_with_nulls(spark, tmp_path):
    left = ParquetSnapshotSink(spark, str(tmp_path / "l"), num_buckets=2)
    right = _right_sink(spark, str(tmp_path / "r"))
    jv = IncrementalJoinView(
        spark, str(tmp_path / "v"), left, right, ["conv_id"], how="left"
    )
    apply_events_batch(
        spark.createDataFrame(
            [(0, '{"op":"insert","ts":"2026-01-01 00:00:01.000000",'
                 '"data":{"conv_id":"a","turn_idx":1,"role":"r",'
                 '"text":"t0","tool":"x"}}')],
            "seq long, event_json string",
        ),
        left, "b1",
    )
    jv.refresh()  # no right partner yet: the left row survives; the
    # right payload column cannot exist yet (an EMPTY right table has
    # no recorded payload schema) — absent-or-NULL both read as "no
    # partner"
    rows = [r.asDict() for r in jv.read().collect()]
    assert [(r["conv_id"], r.get("r_plan")) for r in rows] == [("a", None)]
    right.apply(
        spark.createDataFrame([_rrow(0, "insert", "a", "pro", 2)], R_SCHEMA), "rb1"
    )
    jv.refresh()  # partner arrives: the SAME view row gains its columns
    rows = jv.read().collect()
    assert [(r.conv_id, r.r_plan) for r in rows] == [("a", "pro")]


def test_refresh_idempotent_and_redelivery_noop(spark, ev_parquet, tmp_path):
    ev = spark.read.parquet(ev_parquet)
    left = ParquetSnapshotSink(spark, str(tmp_path / "l"), num_buckets=4)
    right = _right_sink(spark, str(tmp_path / "r"))
    jv = IncrementalJoinView(spark, str(tmp_path / "v"), left, right, ["conv_id"])
    apply_events_batch(ev.filter(F.col("seq") < 1000), left, "b1")
    right.apply(
        parse_change_events(ev.filter(F.col("seq") < 1000)).select(
            "conv_id", F.col("role").alias("plan"), "op", "ts", "seq"
        ),
        "rb1",
    )
    assert not jv.refresh().get("skipped")
    marks = last_folded_versions(jv.view)
    assert marks == (left.current_version(), right.current_version())
    before = _view(jv)
    assert jv.refresh()["reason"] == "up-to-date"
    # fresh handles over the same roots recompute the mark and skip
    jv2 = IncrementalJoinView(
        spark, str(tmp_path / "v"),
        ParquetSnapshotSink(spark, str(tmp_path / "l"), num_buckets=4),
        _right_sink(spark, str(tmp_path / "r")),
        ["conv_id"],
    )
    assert jv2.refresh()["reason"] == "up-to-date"
    assert _view(jv2) == before


def test_join_shape_rejections(spark, tmp_path):
    left = ParquetSnapshotSink(spark, str(tmp_path / "l"), num_buckets=2)
    right = _right_sink(spark, str(tmp_path / "r"))
    with pytest.raises(ValueError, match="FK->PK"):
        IncrementalJoinView(spark, str(tmp_path / "v1"), left, right, ["plan"])
    with pytest.raises(ValueError, match="bucket_by"):
        IncrementalJoinView(
            spark, str(tmp_path / "v2"),
            ParquetSnapshotSink(
                spark, str(tmp_path / "l2"), num_buckets=2, bucket_by="turn_idx"
            ),
            right, ["conv_id"],
        )
    with pytest.raises(ValueError, match="row-level"):
        IncrementalJoinView(
            spark, str(tmp_path / "v3"), left,
            ParquetSnapshotSink(
                spark, str(tmp_path / "rp"), num_buckets=2,
                keys=["conv_id"], patch_cols=["plan"],
            ),
            ["conv_id"],
        )
    with pytest.raises(ValueError, match="inner"):
        IncrementalJoinView(
            spark, str(tmp_path / "v4"), left, right, ["conv_id"], how="full"
        )
