"""Watermark-chunked bootstrap (streaming/chunked.py): interleaved
chunk selects + tail replay over a retention-truncated log must
reproduce the whole-log LWW final state bit-for-bit; the schedule
resumes exactly-once; the simulated source's chunks are disjoint and
covering; the out-of-order delete caveat is pinned both ways."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from embulk_util_json_spark.operators.lww import lww_agg
from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
from embulk_util_json_spark.sources.events import parse_change_events
from embulk_util_json_spark.sources.generator import generate_events
from embulk_util_json_spark.streaming.chunked import (
    chunked_bootstrap_replay,
    log_state_source,
)
from embulk_util_json_spark.streaming.runner import apply_events_batch

N = 3000
RETENTION = N // 3  # tail only replays seq > RETENTION


@pytest.fixture(scope="module")
def ev_parquet(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("chunked") / "events.parquet")
    pq.write_table(generate_events(N, n_convs=40, n_turns=15), path)
    return path


def _state(sink):
    return sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts)
        for r in sink.read().collect()
    )


def _whole_log_state(spark, ev, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "clean"), num_buckets=4)
    apply_events_batch(ev, sink, "all")
    return _state(sink)


def _run(spark, ev, tmp_path, name, **kw):
    tail = ev.filter(F.col("seq") > RETENTION)
    changes_full = parse_change_events(ev)
    sink = ParquetSnapshotSink(spark, str(tmp_path / name), num_buckets=4)
    src = log_state_source(changes_full, n_chunks=3)
    res = chunked_bootstrap_replay(spark, tail, sink, src, n_chunks=3, **kw)
    return sink, res


def test_truncated_tail_plus_chunks_equals_whole_log(spark, ev_parquet, tmp_path):
    ev = spark.read.parquet(ev_parquet)
    sink, res = _run(spark, ev, tmp_path, "t")
    assert _state(sink) == _whole_log_state(spark, ev, tmp_path)
    assert res["seeded_rows"] > 0
    assert len(res["watermarks"]) == 3


def test_fixture_is_not_vacuous(spark, ev_parquet, tmp_path):
    # some keys' ENTIRE history is pre-retention: only chunk seeding
    # can produce them, so the equality above proves the seeding path
    ev = parse_change_events(spark.read.parquet(ev_parquet))
    only_pre = (
        ev.groupBy("conv_id", "turn_idx")
        .agg(F.max("seq").alias("m"))
        .filter(F.col("m") <= RETENTION)
        .count()
    )
    assert only_pre > 0


def test_resume_is_exactly_once(spark, ev_parquet, tmp_path):
    ev = spark.read.parquet(ev_parquet)
    sink, first = _run(spark, ev, tmp_path, "r")
    before = _state(sink)
    tail = ev.filter(F.col("seq") > RETENTION)
    src = log_state_source(parse_change_events(ev), n_chunks=3)
    second = chunked_bootstrap_replay(spark, tail, sink, src, n_chunks=3)
    # identical deterministic batch ids -> every apply is a batchlog skip
    assert all(a.get("skipped") for a in second["applied"])
    assert all(c["result"].get("skipped") for c in second["chunks"])
    assert _state(sink) == before


def test_window_diff_drops_window_touched_keys(spark, ev_parquet, tmp_path):
    # drop_window_keys=True must seed strictly fewer rows whenever a
    # window contains events (the DBLog diff), and those keys still
    # appear in the final table via the log itself
    ev = spark.read.parquet(ev_parquet)
    _, backfill = _run(spark, ev, tmp_path, "b")
    sink_d, diff = _run(spark, ev, tmp_path, "d", drop_window_keys=True)
    assert diff["seeded_rows"] < backfill["seeded_rows"]
    # every window-touched key is still present or tombstoned by log
    # truth: the table simply reflects LWW over (chunks ∪ tail)
    assert sink_d.read().count() > 0


def test_chunks_disjoint_and_covering(spark, ev_parquet):
    ev = parse_change_events(spark.read.parquet(ev_parquet))
    src = log_state_source(ev, n_chunks=3)
    parts = [src(i, N) for i in range(3)]
    total = parts[0].unionByName(parts[1]).unionByName(parts[2])
    full = lww_agg(ev.filter(F.col("seq") <= N), ["conv_id", "turn_idx"], ["ts", "seq"]).drop("seq")
    assert total.count() == full.count()
    assert total.join(full, ["conv_id", "turn_idx"], "left_anti").count() == 0
    # disjoint: no key in two chunks
    assert (
        total.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
        == 0
    )


def _mk_envelopes(spark, rows):
    # rows: (seq, op, ts_iso, conv, turn, text)
    data = [
        (
            seq,
            f'{{"op":"{op}","ts":"{ts}","data":{{"conv_id":"{c}",'
            f'"turn_idx":{t},"role":"user","text":"{x}","tool":null}}}}',
        )
        for seq, op, ts, c, t, x in rows
    ]
    return spark.createDataFrame(data, "seq long, event_json string")


def test_out_of_order_delete_not_resurrected_with_tombstones(spark, tmp_path):
    # k1: insert(ts=5) then delete(ts=9) — both pre-retention; a tail
    # update arrives with OLDER event time (ts=7). Whole-log LWW: the
    # delete wins (ts 9) -> key absent. Tombstone-complete chunks
    # preserve that; a tombstone-free source resurrects (documented).
    rows = [
        (1, "insert", "2024-01-01 00:00:05", "k1", 0, "v1"),
        (3, "delete", "2024-01-01 00:00:09", "k1", 0, "gone"),
        (2, "insert", "2024-01-01 00:00:04", "k2", 0, "keep"),
    ] + [
        # filler tail so the watermark schedule has room
        (s, "insert", f"2024-01-01 00:01:{s:02d}", f"f{s}", 0, "f")
        for s in range(6, 14)
    ] + [
        (14, "update", "2024-01-01 00:00:07", "k1", 0, "stale-resurrect"),
    ]
    ev = _mk_envelopes(spark, rows)
    tail = ev.filter(F.col("seq") > 5)
    changes_full = parse_change_events(ev)

    for tomb, expect_k1 in [(True, False), (False, True)]:
        sink = ParquetSnapshotSink(
            spark, str(tmp_path / f"tomb{tomb}"), num_buckets=2
        )
        src = log_state_source(changes_full, n_chunks=2, include_tombstones=tomb)
        chunked_bootstrap_replay(spark, tail, sink, src, n_chunks=2)
        k1 = [r for r in sink.read().collect() if r.conv_id == "k1"]
        assert bool(k1) is expect_k1
        if expect_k1:
            assert k1[0].text == "stale-resurrect"
