"""Minor (tiered) compaction (sinks/snapshot.compact_minor): collapse
each bucket's delta levels into one, leaving the base level(s)
untouched on disk — write cost O(deltas), never O(table). Exact by the
closed commutative reduction; tombstones always kept (a delta tombstone
may mask a base row)."""

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


def _chains(sink):
    m = sink.current_manifest()
    return {b: list(ps) for b, ps in m["buckets"].items()}


def test_minor_merges_deltas_keeps_base(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=1, mode="mor")
    apply_events_batch(_mk(spark, [_ev(0, "insert", "a", 1, 1)]), sink, "b0")
    sink.compact(drop_tombstones=False)  # major → base level
    base_paths = _chains(sink)["0"]
    apply_events_batch(_mk(spark, [_ev(1, "insert", "b", 1, 2)]), sink, "b1")
    apply_events_batch(_mk(spark, [_ev(2, "update", "a", 1, 3, text="hot")]), sink, "b2")
    apply_events_batch(_mk(spark, [_ev(3, "delete", "b", 1, 4)]), sink, "b3")
    before = _state(sink.read())
    m = sink.compact_minor()
    assert m["buckets_compacted"] == 1
    assert m["delta_levels_merged"] == 3 and m["base_levels_untouched"] == 1
    chain = _chains(sink)["0"]
    assert chain[: len(base_paths)] == base_paths, "base paths must be untouched"
    assert len(chain) == len(base_paths) + 1, "deltas collapsed to one level"
    assert _state(sink.read()) == before == [("a", 1, "hot")]
    # the delta tombstone still masks the base row after the merge
    tombs = sink.read(include_tombstones=True).filter(F.col("op") == "delete")
    assert [(r.conv_id,) for r in tombs.collect()] == [("b",)]


def test_minor_on_never_compacted_chain(spark, tmp_path):
    """Without a major compaction the oldest delta serves as base."""
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=1, mode="mor")
    for i in range(4):
        apply_events_batch(
            _mk(spark, [_ev(i, "insert", f"c{i}", 1, i + 1)]), sink, f"b{i}"
        )
    first = _chains(sink)["0"][0]
    before = _state(sink.read())
    sink.compact_minor()
    chain = _chains(sink)["0"]
    assert chain[0] == first and len(chain) == 2
    assert _state(sink.read()) == before


def test_minor_preserves_banded_base_and_pruning(spark, tmp_path):
    """A banded base keeps every band element verbatim — and keeps the
    read(min_ts=) prune alive — while deltas above it merge."""
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=1, mode="mor")
    apply_events_batch(_mk(spark, [_ev(0, "insert", "a", 1, 1)]), sink, "b0")
    apply_events_batch(_mk(spark, [_ev(1, "insert", "b", 1, 20)]), sink, "b1")
    sink.compact(drop_tombstones=False, ts_bands=["2026-01-10 00:00:00"])
    band_base = _chains(sink)["0"]
    assert len(band_base) == 2 and all("_band=" in p for p in band_base)
    apply_events_batch(_mk(spark, [_ev(2, "insert", "c", 1, 21)]), sink, "b2")
    apply_events_batch(_mk(spark, [_ev(3, "insert", "d", 1, 22)]), sink, "b3")
    sink.compact_minor()
    chain = _chains(sink)["0"]
    assert chain[:2] == band_base and len(chain) == 3
    fresh = sink.read(min_ts="2026-01-15 00:00:00")
    assert _state(fresh) == [("b", 1, "t1"), ("c", 1, "t2"), ("d", 1, "t3")]
    assert len(fresh.inputFiles()) < len(sink.read().inputFiles()), (
        "cold band must stay pruned through minor compaction"
    )


def test_minor_skips_shallow_chains(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=1, mode="mor")
    apply_events_batch(_mk(spark, [_ev(0, "insert", "a", 1, 1)]), sink, "b0")
    apply_events_batch(_mk(spark, [_ev(1, "insert", "b", 1, 2)]), sink, "b1")
    v = sink.current_version()
    assert sink.compact_minor(min_delta_levels=2).get("skipped")
    assert sink.current_version() == v, "no-op must not commit"


def test_minor_patch_mode_carry_forward_exact(spark, tmp_path):
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

    apply_events_batch(_mk(spark, [_patch(0, "a", 1, role="r1")]), sink, "b0")
    sink.compact(drop_tombstones=False)
    apply_events_batch(_mk(spark, [_patch(1, "a", 2, text="body")]), sink, "b1")
    apply_events_batch(_mk(spark, [_patch(2, "a", 3, tool="hammer")]), sink, "b2")
    sink.compact_minor()
    row = sink.read().collect()[0]
    assert (row.role, row.text, row.tool) == ("r1", "body", "hammer")


def test_maintain_policy_routes_minor_vs_major(spark, tmp_path):
    """Big base + few deltas → minor (base untouched); no-base deep
    chain → major (full collapse). Shallow chains untouched."""
    # bucket with a BIG compacted base then small deltas
    big = ParquetSnapshotSink(spark, str(tmp_path / "big"), num_buckets=1, mode="mor")
    apply_events_batch(
        _mk(spark, [_ev(i, "insert", f"c{i:04d}", 1, 1,
                        text=f"{i:07d}" * 300)  # distinct per row: resists RLE
                    for i in range(1000)]),
        big, "b0",
    )
    big.compact(drop_tombstones=False)
    base_paths = _chains(big)["0"]
    for i in range(4):
        apply_events_batch(
            _mk(spark, [_ev(1000 + i, "update", "c0000", 1, 2 + i)]), big, f"d{i}"
        )
    before = _state(big.read())
    m = big.maintain(max_chain=3)
    assert m["minor_buckets"] == 1 and m["major_buckets"] == 0
    chain = _chains(big)["0"]
    assert chain[: len(base_paths)] == base_paths and len(chain) == len(base_paths) + 1
    assert _state(big.read()) == before

    # never-compacted deep chain of similar-size deltas → major
    flat = ParquetSnapshotSink(spark, str(tmp_path / "flat"), num_buckets=1, mode="mor")
    for i in range(5):
        apply_events_batch(
            _mk(spark, [_ev(i, "insert", f"k{i}", 1, i + 1)]), flat, f"b{i}"
        )
    before = _state(flat.read())
    m = flat.maintain(max_chain=3)
    assert m["major_buckets"] == 1 and m["minor_buckets"] == 0
    assert len(_chains(flat)["0"]) == 1
    assert _state(flat.read()) == before

    # shallow chain: untouched either way
    v = flat.current_version()
    assert flat.maintain(max_chain=3) == {"minor_buckets": 0, "major_buckets": 0}
    assert flat.current_version() == v
