"""Incremental aggregate view (pipeline/agg_view.py) and the
preimage/postimage change feed (read_changes include_preimage): the
fold must equal recompute under updates and deletes, groups vanish
when emptied, refresh is idempotent, and patch-mode tables reject the
preimage feed."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from embulk_util_json_spark.pipeline.agg_view import IncrementalAggView
from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
from embulk_util_json_spark.sources.generator import generate_events
from embulk_util_json_spark.streaming.runner import apply_events_batch

N = 3000


@pytest.fixture(scope="module")
def ev_parquet(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("aggview") / "events.parquet")
    pq.write_table(generate_events(N, n_convs=30, n_turns=20), path)
    return path


def _mv(spark, sink, path):
    return IncrementalAggView(
        spark,
        path,
        sink,
        ["conv_id"],
        {"n_turns": F.lit(1), "sum_len": F.length("text")},
    )


def _recompute(sink):
    return sorted(
        (r.conv_id, r.n_turns, r.sum_len)
        for r in sink.read()
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).alias("sum_len"),
        )
        .collect()
    )


def _view(mv):
    return sorted((r.conv_id, r.n_turns, r.sum_len) for r in mv.read().collect())


def test_fold_equals_recompute_across_batches(spark, ev_parquet, tmp_path):
    ev = spark.read.parquet(ev_parquet)
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=4)
    mv = _mv(spark, sink, str(tmp_path / "mv"))
    for i, (a, b) in enumerate([(0, 1000), (1000, 2000), (2000, N)]):
        apply_events_batch(
            ev.filter((F.col("seq") >= a) & (F.col("seq") < b)), sink, f"b{i}"
        )
        r = mv.refresh()
        assert not r["skipped"]
        assert _view(mv) == _recompute(sink)  # exact at EVERY step


def test_preimage_feed_shape(spark, ev_parquet, tmp_path):
    ev = spark.read.parquet(ev_parquet)
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=4)
    apply_events_batch(ev.filter(F.col("seq") < 1500), sink, "b1")
    v1 = sink.current_version()
    apply_events_batch(ev.filter(F.col("seq") >= 1500), sink, "b2")
    feed = sink.read_changes(v1, include_preimage=True)
    pre = feed.filter(F.col("_change") == "preimage")
    post = feed.filter(F.col("_change") == "postimage")
    assert post.count() > 0 and pre.count() > 0
    # a preimage exists only for keys that also ship a postimage
    assert pre.join(post, ["conv_id", "turn_idx"], "left_anti").count() == 0
    # preimage rows are the OLD winners: re-reading v1 for those keys
    # must agree bit-for-bit
    old = sink.read(at_version=v1, include_tombstones=True)
    joined = pre.select("conv_id", "turn_idx", F.col("text").alias("pt")).join(
        old.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"]
    )
    assert joined.filter(~F.col("pt").eqNullSafe(F.col("text"))).count() == 0


def test_group_removed_when_emptied(spark, tmp_path):
    rows = [
        (0, '{"op":"insert","ts":"2026-01-01 00:00:01.000000","data":{"conv_id":"gone","turn_idx":1,"role":"r","text":"abc","tool":"x"}}'),
        (1, '{"op":"insert","ts":"2026-01-01 00:00:02.000000","data":{"conv_id":"stay","turn_idx":1,"role":"r","text":"defg","tool":"x"}}'),
    ]
    kill = [
        (2, '{"op":"delete","ts":"2026-01-01 00:00:03.000000","data":{"conv_id":"gone","turn_idx":1,"role":"r","text":"abc","tool":"x"}}'),
    ]
    mk = lambda rs: spark.createDataFrame(rs, "seq long, event_json string")
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=2)
    mv = _mv(spark, sink, str(tmp_path / "mv"))
    apply_events_batch(mk(rows), sink, "b1")
    mv.refresh()
    assert _view(mv) == [("gone", 1, 3), ("stay", 1, 4)]
    apply_events_batch(mk(kill), sink, "b2")
    mv.refresh()
    # the emptied group DISAPPEARS (no zero row)
    assert _view(mv) == [("stay", 1, 4)]


def test_refresh_idempotent(spark, ev_parquet, tmp_path):
    ev = spark.read.parquet(ev_parquet)
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=4)
    mv = _mv(spark, sink, str(tmp_path / "mv"))
    apply_events_batch(ev, sink, "b1")
    assert not mv.refresh()["skipped"]
    before = _view(mv)
    assert mv.refresh()["skipped"]
    assert _view(mv) == before


def test_preimage_rejected_for_patch_mode(spark, ev_parquet, tmp_path):
    ev = spark.read.parquet(ev_parquet)
    sink = ParquetSnapshotSink(
        spark, str(tmp_path / "t"), num_buckets=2, patch_cols=["text"]
    )
    apply_events_batch(ev.filter(F.col("seq") < 100), sink, "b1")
    with pytest.raises(ValueError, match="row-level"):
        sink.read_changes(0, include_preimage=True).count()


def test_feed_window_missing_evolved_column_resolves(spark, tmp_path):
    """A refresh window whose batches do not carry an already-evolved
    measure column (additive evolution: later writers may omit it)
    must still resolve and fold exactly: the engine aligns the feed to
    the sink's CURRENT read schema, and rows without the column
    contribute NULL -> 0, which is what they hold for it."""
    import datetime

    rows = [
        (f"c{i}", 0, "user", f"t{i}", i * 10,
         datetime.datetime(2025, 1, 1, 0, 0, i), "upsert", i)
        for i in range(8)
    ]
    base = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "score long, ts timestamp, op string, seq long",
    )
    sink = ParquetSnapshotSink(spark, str(tmp_path / "ev"), num_buckets=2)
    mv = IncrementalAggView(
        spark,
        str(tmp_path / "mv"),
        sink,
        ["conv_id"],
        {"n": F.lit(1), "score_sum": F.col("score")},
    )
    sink.apply(base, "b0")
    assert not mv.refresh()["skipped"]
    # batch 2 omits `score` entirely: updates to c0/c1 + a new key
    nxt = (
        base.filter(F.col("conv_id") < "c2")
        .unionByName(base.limit(1).withColumn("conv_id", F.lit("c9")))
        .drop("score")
        .withColumn("seq", F.col("seq") + 100)
        .withColumn("ts", F.col("ts") + F.expr("interval 1 hour"))
    )
    sink.apply(nxt, "b1")
    assert not mv.refresh()["skipped"]
    got = {r.conv_id: (r.n, r.score_sum) for r in mv.read().collect()}
    want = {
        r.conv_id: (r.n, r.score_sum)
        for r in sink.read()
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("score").cast("long").alias("score_sum"),
        )
        .collect()
    }
    # fold stores 0 where recompute has NULL (additive identity)
    norm = lambda d: {k: (n, s or 0) for k, (n, s) in d.items()}
    assert norm(got) == norm(want)
