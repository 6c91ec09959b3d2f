"""Footer zone maps + freshness-pruned reads (sinks/snapshot.py
file_stats / read(min_ts=...)): every bucket-partitioned write records
per-chain-element [min, max] epoch-µs of the order column from parquet
row-group footers (driver-side metadata read, no extra job);
read(min_ts=T) returns keys whose LWW winner is at/after T and prunes
chain elements whose zone map proves max < T before the scan.

Exactness pins: lower-bound pruning never changes the result (a pruned
row either loses to an in-range row or its key's winner is below the
bound and filtered anyway); patch-mode tables skip pruning because
carry-forward reads column values out of old rows."""

import pytest
from pyspark.sql import functions as F

from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
from embulk_util_json_spark.streaming.runner import apply_events_batch


def _ev(seq, op, conv, turn, day, text=None):
    return (
        seq,
        f'{{"op":"{op}","ts":"2026-01-{day:02d} 00:00:00.000000",'
        f'"data":{{"conv_id":"{conv}","turn_idx":{turn},"role":"r",'
        f'"text":"{text or f"t{seq}"}","tool":"x"}}}}',
    )


def _mk(spark, rows):
    return spark.createDataFrame(rows, "seq long, event_json string")


def _state(df):
    return sorted((r.conv_id, r.turn_idx, r.text) for r in df.collect())


def test_stats_recorded_and_read_pruned(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=2, mode="mor")
    # three day-ordered deltas (the CDC shape: commits roughly time-ordered)
    apply_events_batch(_mk(spark, [_ev(0, "insert", "a", 1, 1)]), sink, "b0")
    apply_events_batch(_mk(spark, [_ev(1, "insert", "b", 1, 5)]), sink, "b1")
    apply_events_batch(_mk(spark, [_ev(2, "insert", "c", 1, 9)]), sink, "b2")
    stats = sink.current_manifest()["file_stats"]
    assert stats, "zone maps must be recorded at write"
    for lo, hi in stats.values():
        assert isinstance(lo, int) and isinstance(hi, int) and lo <= hi
    full_files = set(sink.read().inputFiles())
    fresh = sink.read(min_ts="2026-01-07")
    assert _state(fresh) == [("c", 1, "t2")]
    pruned_files = set(fresh.inputFiles())
    assert pruned_files < full_files, "old deltas must be pruned from the scan"
    # pruning to nothing: typed empty frame, not a crash
    assert sink.read(min_ts="2027-01-01").count() == 0


def test_pruning_exactness_winner_below_and_above_bound(spark, tmp_path):
    """Key updated across the bound: the in-range winner survives and
    the pruned old row changes nothing. Key entirely below: dropped by
    the residual either way. Result must equal residual-only filtering
    of the unpruned state."""
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=2, mode="mor")
    apply_events_batch(
        _mk(spark, [_ev(0, "insert", "a", 1, 1), _ev(1, "insert", "old", 1, 2)]),
        sink,
        "b0",
    )
    apply_events_batch(
        _mk(spark, [_ev(2, "update", "a", 1, 8, text="new"),
                    _ev(3, "delete", "gone", 1, 9)]),
        sink,
        "b1",
    )
    want = _state(
        sink.read().filter(F.col("ts") >= F.lit("2026-01-05").cast("timestamp"))
    )
    got = _state(sink.read(min_ts="2026-01-05"))
    assert got == want == [("a", 1, "new")]
    # tombstoned key with an in-range delete winner stays out of state
    # but shows with include_tombstones
    tomb = sink.read(min_ts="2026-01-05", include_tombstones=True)
    assert ("gone", 1, "t3") in _state(tomb)


def test_min_ts_with_key_pruned_reads(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=4, mode="mor")
    apply_events_batch(_mk(spark, [_ev(0, "insert", "a", 1, 1)]), sink, "b0")
    apply_events_batch(_mk(spark, [_ev(1, "update", "a", 1, 8, text="hot")]), sink, "b1")
    apply_events_batch(_mk(spark, [_ev(2, "insert", "z", 1, 2)]), sink, "b2")
    # point lookup: only 'a's chain, minus the pruned old delta
    got = sink.read(key_eq={"conv_id": "a"}, min_ts="2026-01-05")
    assert _state(got) == [("a", 1, "hot")]
    # stale point lookup: residual filters the winner out
    assert sink.read(key_eq={"conv_id": "z"}, min_ts="2026-01-05").count() == 0
    # probe-keys set read composes the same way
    probe = spark.createDataFrame([("a",), ("z",)], "conv_id string")
    assert _state(sink.read(probe_keys=probe, min_ts="2026-01-05")) == [
        ("a", 1, "hot")
    ]


def test_compact_rewrites_stats_and_drops_stale_entries(spark, tmp_path):
    sink = ParquetSnapshotSink(
        spark, str(tmp_path / "t"), num_buckets=2, mode="mor", compact_every=64
    )
    apply_events_batch(_mk(spark, [_ev(0, "insert", "a", 1, 1)]), sink, "b0")
    apply_events_batch(_mk(spark, [_ev(1, "insert", "b", 1, 9)]), sink, "b1")
    sink.compact()
    m = sink.current_manifest()
    referenced = {p for b in m["buckets"] for p in m["buckets"][b]}
    assert set(m["file_stats"]) <= referenced, "stale zone-map entries must drop"
    assert m["file_stats"], "compacted chains must be re-statted"
    # post-compact chains are single fully-merged elements spanning all
    # days, so a freshness read prunes nothing — but stays exact
    assert _state(sink.read(min_ts="2026-01-05")) == [("b", 1, "t1")]


def test_patch_mode_skips_pruning_keeps_carry_forward(spark, tmp_path):
    """Patch table: column written on day 1, another on day 9. A
    min_ts=day 5 read keeps the key (winner ts = day 9) and MUST still
    carry the day-1 column value — file pruning would lose it, so
    patch mode prunes nothing and only applies the residual."""
    sink = ParquetSnapshotSink(
        spark,
        str(tmp_path / "p"),
        num_buckets=2,
        mode="mor",
        patch_cols=["role", "text", "tool"],
    )

    def _patch(seq, day, **cols):
        body = ",".join(
            f'"{k}":"{v}"' for k, v in cols.items()
        )
        return (
            seq,
            f'{{"op":"update","ts":"2026-01-{day:02d} 00:00:00.000000",'
            f'"data":{{"conv_id":"a","turn_idx":1,{body}}}}}',
        )

    apply_events_batch(_mk(spark, [_patch(0, 1, role="r1")]), sink, "b0")
    apply_events_batch(_mk(spark, [_patch(1, 9, text="late")]), sink, "b1")
    got = sink.read(min_ts="2026-01-05").collect()
    assert len(got) == 1
    assert (got[0].role, got[0].text) == ("r1", "late")
    # full scan confirmed: nothing pruned for patch tables
    assert set(sink.read(min_ts="2026-01-05").inputFiles()) == set(
        sink.read().inputFiles()
    )
    # and below-bound winners are still residual-filtered
    assert sink.read(min_ts="2026-02-01").count() == 0


def test_banded_compact_preserves_state_and_pruning(spark, tmp_path):
    """Time-banded compaction: state identical to plain compaction,
    chain = one element per (band, bucket), zone maps recorded per
    band path, and a freshness read still prunes the cold bands —
    plain compaction would have collapsed to one all-time element and
    killed the prune."""
    sink = ParquetSnapshotSink(
        spark, str(tmp_path / "t"), num_buckets=2, mode="mor", compact_every=64
    )
    apply_events_batch(
        _mk(spark, [_ev(0, "insert", "a", 1, 1), _ev(1, "insert", "b", 1, 2)]),
        sink, "b0",
    )
    apply_events_batch(
        _mk(spark, [_ev(2, "update", "a", 1, 6, text="mid")]), sink, "b1"
    )
    apply_events_batch(_mk(spark, [_ev(3, "insert", "c", 1, 9)]), sink, "b2")
    want = _state(sink.read())
    sink.compact(
        drop_tombstones=False, ts_bands=["2026-01-04", "2026-01-08"]
    )
    m = sink.current_manifest()
    assert _state(sink.read()) == want, "banded compact must not change state"
    all_paths = [p for b in m["buckets"] for p in m["buckets"][b]]
    assert any("_band=" in p for p in all_paths)
    assert set(m["file_stats"]) == set(all_paths), "every band path statted"
    fresh = sink.read(min_ts="2026-01-08 12:00:00")
    assert _state(fresh) == [("c", 1, "t3")]
    assert set(fresh.inputFiles()) < set(sink.read().inputFiles()), (
        "freshness read must prune cold bands post-compaction"
    )


def test_banded_compact_quantile_edges(spark, tmp_path):
    sink = ParquetSnapshotSink(
        spark, str(tmp_path / "t"), num_buckets=2, mode="mor", compact_every=64
    )
    apply_events_batch(
        _mk(spark, [_ev(i, "insert", f"c{i}", 1, 1 + 3 * i) for i in range(8)]),
        sink, "b0",
    )
    want = _state(sink.read())
    res = sink.compact(drop_tombstones=False, ts_bands=4)
    assert _state(sink.read()) == want
    bands = {
        p.split("/")[-2]
        for b in sink.current_manifest()["buckets"]
        for p in sink.current_manifest()["buckets"][b]
    }
    assert len(bands) >= 2, f"quantile banding must split time: {bands}"
    with pytest.raises(ValueError, match=">= 2"):
        sink.compact(ts_bands=1)


def test_vacuum_handles_band_layout(spark, tmp_path):
    sink = ParquetSnapshotSink(
        spark, str(tmp_path / "t"), num_buckets=2, mode="mor", compact_every=64
    )
    apply_events_batch(_mk(spark, [_ev(0, "insert", "a", 1, 1)]), sink, "b0")
    apply_events_batch(_mk(spark, [_ev(1, "insert", "b", 1, 9)]), sink, "b1")
    sink.compact(drop_tombstones=False, ts_bands=["2026-01-05"])
    want = _state(sink.read())
    # band dirs still referenced by the current manifest: must survive
    sink.vacuum(keep_versions=1)
    assert _state(sink.read()) == want
    banded_version_dirs = [
        d for d in (tmp_path / "t" / "data").iterdir()
        if any(s.name.startswith("_band=") for s in d.iterdir())
    ]
    assert banded_version_dirs, "referenced band layout must survive vacuum"
    # plain re-compaction supersedes the bands; vacuum reclaims them
    sink.compact(drop_tombstones=False)
    sink.vacuum(keep_versions=1)
    assert _state(sink.read()) == want
    leftover = [
        s
        for d in (tmp_path / "t" / "data").iterdir() if d.is_dir()
        for s in d.iterdir() if s.name.startswith("_band=")
    ]
    assert not leftover, f"superseded band dirs must be reclaimed: {leftover}"


def test_key_range_skipping_point_lookup(spark, tmp_path):
    """Footer key-range zone maps: a point lookup opens only the chain
    elements whose [min,max] key range can contain the probed key —
    deltas that touched disjoint key ranges are skipped entirely."""
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=1, mode="mor")
    apply_events_batch(
        _mk(spark, [_ev(0, "insert", "aa", 1, 1), _ev(1, "insert", "ab", 1, 1)]),
        sink, "b0",
    )
    apply_events_batch(
        _mk(spark, [_ev(2, "insert", "zy", 1, 2), _ev(3, "insert", "zz", 1, 2)]),
        sink, "b1",
    )
    apply_events_batch(
        _mk(spark, [_ev(4, "update", "aa", 1, 3, text="hot")]), sink, "b2"
    )
    assert sink.current_manifest()["key_stats"], "key zone maps recorded"
    full = set(sink.read().inputFiles())
    zz = sink.read(key_eq={"conv_id": "zz"})
    assert _state(zz) == [("zz", 1, "t3")]
    assert set(zz.inputFiles()) < full, "disjoint-key deltas must be skipped"
    # key updated across deltas: both its elements open, result exact
    assert _state(sink.read(key_eq={"conv_id": "aa"})) == [("aa", 1, "hot")]
    # miss inside the bucket: skipping alone may empty the chain — the
    # typed-empty fall-through must hold
    assert sink.read(key_eq={"conv_id": "mm"}).count() == 0


def test_key_skipping_exact_in_patch_mode(spark, tmp_path):
    """Key skipping removes only OTHER keys' rows, so unlike ts
    pruning it stays exact for patch tables: the looked-up key's
    carry-forward columns must survive."""
    sink = ParquetSnapshotSink(
        spark, str(tmp_path / "p"), num_buckets=1, mode="mor",
        patch_cols=["role", "text", "tool"],
    )

    def _patch(seq, conv, day, **cols):
        body = ",".join(f'"{k}":"{v}"' for k, v in cols.items())
        return (
            seq,
            f'{{"op":"update","ts":"2026-01-{day:02d} 00:00:00.000000",'
            f'"data":{{"conv_id":"{conv}","turn_idx":1,{body}}}}}',
        )

    apply_events_batch(_mk(spark, [_patch(0, "aa", 1, role="r1")]), sink, "b0")
    apply_events_batch(_mk(spark, [_patch(1, "zz", 2, role="rz")]), sink, "b1")
    apply_events_batch(_mk(spark, [_patch(2, "aa", 3, text="late")]), sink, "b2")
    row = sink.read(key_eq={"conv_id": "aa"}).collect()[0]
    assert (row.role, row.text) == ("r1", "late"), "carry-forward intact"
    zz = sink.read(key_eq={"conv_id": "zz"})
    assert set(zz.inputFiles()) < set(sink.read().inputFiles())
