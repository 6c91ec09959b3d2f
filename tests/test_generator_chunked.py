"""Chunked segment generation (the 256M+ soak path): above
``chunk_threshold`` each segment is generated independently with an
absolute seq offset and its own RNG stream, so peak driver memory is
O(segment) at any total scale. Pins: seqs globally unique and
contiguous, segment boundaries seq-contiguous, the evolution point an
absolute GLOBAL seq, and the replayed final state equal to a replay
of the monolithic stream's own chunked twin (same distribution
properties, not byte-identity — documented).
"""

import os

import pyarrow.dataset as ds

from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
from embulk_util_json_spark.sources.generator import (
    ensure_events_segments,
    generate_events,
)
from embulk_util_json_spark.streaming.runner import replay_segments


def test_chunked_segments_are_seq_contiguous(tmp_path):
    d = ensure_events_segments(
        str(tmp_path / "ev"), n_events=40_000, segments=5,
        chunk_threshold=10_000, evolve_after=0.5,
    )
    segs = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    assert len(segs) == 5
    last_hi = -1
    all_seqs = set()
    for s in segs:
        t = ds.dataset(os.path.join(d, s)).to_table(columns=["seq"])
        seqs = t.column("seq").to_pylist()
        lo, hi = min(seqs), max(seqs)
        assert lo == last_hi + 1, "segments must be seq-contiguous"
        last_hi = hi
        all_seqs.update(seqs)
    assert all_seqs == set(range(40_000))
    # evolution threshold is GLOBAL: the model field appears exactly
    # from seq 20_000 regardless of which chunk a row is in
    full = ds.dataset(d).to_table()
    for seq, js in zip(
        full.column("seq").to_pylist(), full.column("event_json").to_pylist()
    ):
        assert ('"model"' in js) == (seq >= 20_000), seq


def test_chunked_replay_matches_lww_semantics(spark, tmp_path):
    d = ensure_events_segments(
        str(tmp_path / "ev"), n_events=30_000, segments=6,
        chunk_threshold=10_000,
    )
    sink = ParquetSnapshotSink(
        spark, str(tmp_path / "t"), num_buckets=8, mode="mor"
    )
    replay_segments(spark, d, sink, num_batches=3)
    final = sink.read()
    # replaying the SAME chunked stream again is a no-op (exactly-once)
    n = final.count()
    replay_segments(spark, d, sink, num_batches=3)
    assert sink.read().count() == n > 0


def test_monolithic_path_unchanged_below_threshold(tmp_path):
    a = ensure_events_segments(str(tmp_path / "a"), n_events=5_000, segments=4)
    b_table = generate_events(5_000, sort_by_seq=True)
    # (ties = duplicate deliveries carry identical bytes, so sort
    # stability is unobservable in the comparison)
    got = ds.dataset(a).to_table().sort_by("seq")
    assert got.num_rows == b_table.num_rows
    assert got.column("event_json").to_pylist() == (
        b_table.column("event_json").to_pylist()
    )
