"""Secondary index (sinks/index.py): lookup-through-index must equal
a full-scan filter at every refresh point, value moves and deletes
retire their postings, refresh is idempotent/redelivery-safe, NULLs
are never indexed, and the verify flag governs lag-induced false
positives."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from embulk_util_json_spark.sinks.index import SecondaryIndex, last_indexed_version
from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
from embulk_util_json_spark.sources.generator import generate_events
from embulk_util_json_spark.streaming.runner import apply_events_batch

N = 3000


@pytest.fixture(scope="module")
def ev_parquet(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("secidx") / "events.parquet")
    pq.write_table(generate_events(N, n_convs=30, n_turns=20), path)
    return path


def _mk(spark, rows):
    return spark.createDataFrame(rows, "seq long, event_json string")


def _ev(seq, op, conv, turn, tool, sec):
    tool_json = "null" if tool is None else f'"{tool}"'
    return (
        seq,
        f'{{"op":"{op}","ts":"2026-01-01 00:00:{sec:02d}.000000",'
        f'"data":{{"conv_id":"{conv}","turn_idx":{turn},"role":"r",'
        f'"text":"t{seq}","tool":{tool_json}}}}}',
    )


def _keys(df):
    return sorted((r.conv_id, r.turn_idx) for r in df.collect())


def test_lookup_equals_scan_at_every_refresh(spark, ev_parquet, tmp_path):
    ev = spark.read.parquet(ev_parquet)
    base = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=4)
    ix = SecondaryIndex(spark, str(tmp_path / "ix"), base, "tool")
    for i, (a, b) in enumerate([(0, 1000), (1000, 2000), (2000, N)]):
        apply_events_batch(
            ev.filter((F.col("seq") >= a) & (F.col("seq") < b)), base, f"b{i}"
        )
        r = ix.refresh()
        assert not r.get("skipped"), r
        for tool in ("search", "python", "browser"):
            via_index = _keys(ix.lookup(tool, verify=False))
            via_scan = _keys(base.read().filter(F.col("tool") == tool))
            assert via_index == via_scan, (i, tool)


def test_value_move_and_delete_retire_postings(spark, tmp_path):
    base = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=2)
    ix = SecondaryIndex(spark, str(tmp_path / "ix"), base, "tool")
    apply_events_batch(
        _mk(spark, [_ev(0, "insert", "a", 1, "search", 1),
                    _ev(1, "insert", "b", 1, "search", 2)]),
        base, "b1",
    )
    ix.refresh()
    assert _keys(ix.postings("search")) == [("a", 1), ("b", 1)]
    # a's tool MOVES search→python; b is deleted outright
    apply_events_batch(
        _mk(spark, [_ev(2, "update", "a", 1, "python", 3),
                    _ev(3, "delete", "b", 1, "search", 4)]),
        base, "b2",
    )
    ix.refresh()
    assert _keys(ix.postings("search")) == []          # both retired
    assert _keys(ix.postings("python")) == [("a", 1)]  # moved posting live
    assert _keys(ix.lookup("search", verify=False)) == []
    assert _keys(ix.lookup("python", verify=False)) == [("a", 1)]


def test_same_value_update_keeps_posting(spark, tmp_path):
    # delete+upsert at the SAME entry key in one window: the pref tie
    # rule must keep the live posting
    base = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=2)
    ix = SecondaryIndex(spark, str(tmp_path / "ix"), base, "tool")
    apply_events_batch(_mk(spark, [_ev(0, "insert", "a", 1, "search", 1)]), base, "b1")
    ix.refresh()
    apply_events_batch(_mk(spark, [_ev(1, "update", "a", 1, "search", 2)]), base, "b2")
    ix.refresh()
    assert _keys(ix.postings("search")) == [("a", 1)]
    rows = ix.lookup("search", verify=False).collect()
    assert [(r.conv_id, r.text) for r in rows] == [("a", "t1")]  # new row served


def test_null_values_not_indexed(spark, tmp_path):
    base = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=2)
    ix = SecondaryIndex(spark, str(tmp_path / "ix"), base, "tool")
    apply_events_batch(
        _mk(spark, [_ev(0, "insert", "a", 1, None, 1),
                    _ev(1, "insert", "b", 1, "search", 2)]),
        base, "b1",
    )
    ix.refresh()
    assert ix.index.read().filter(F.col("_iv").isNull()).count() == 0
    assert _keys(ix.postings("search")) == [("b", 1)]


def test_refresh_idempotent_and_redelivery_noop(spark, ev_parquet, tmp_path):
    ev = spark.read.parquet(ev_parquet)
    base = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=4)
    ix = SecondaryIndex(spark, str(tmp_path / "ix"), base, "tool")
    apply_events_batch(ev.filter(F.col("seq") < 1500), base, "b1")
    assert not ix.refresh().get("skipped")
    v = last_indexed_version(ix.index)
    assert v == base.current_version()
    assert ix.refresh()["reason"] == "up-to-date"
    # crash-redelivery: a FRESH handle over the same roots recomputes
    # the high-water mark from the index batch log and skips too
    base2 = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=4)
    ix2 = SecondaryIndex(spark, str(tmp_path / "ix"), base2, "tool")
    assert ix2.refresh()["reason"] == "up-to-date"
    assert last_indexed_version(ix2.index) == v


def test_verify_drops_lag_false_positives(spark, tmp_path):
    base = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=2)
    ix = SecondaryIndex(spark, str(tmp_path / "ix"), base, "tool")
    apply_events_batch(_mk(spark, [_ev(0, "insert", "a", 1, "search", 1)]), base, "b1")
    ix.refresh()
    # value moves WITHOUT a refresh: the index is now stale
    apply_events_batch(_mk(spark, [_ev(1, "update", "a", 1, "python", 2)]), base, "b2")
    assert _keys(ix.lookup("search", verify=False)) == [("a", 1)]  # stale posting
    assert _keys(ix.lookup("search")) == []  # verify re-checks the base row
    ix.refresh()
    assert _keys(ix.lookup("search", verify=False)) == []  # caught up


def test_covering_lookup_serves_index_only(spark, ev_parquet, tmp_path):
    ev = spark.read.parquet(ev_parquet)
    base = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=4)
    ix = SecondaryIndex(
        spark, str(tmp_path / "ix"), base, "tool", include_cols=["text", "role"]
    )
    for i, (a, b) in enumerate([(0, 1500), (1500, N)]):
        apply_events_batch(
            ev.filter((F.col("seq") >= a) & (F.col("seq") < b)), base, f"b{i}"
        )
        ix.refresh()
        # covered serving ≡ base-table serving, at every refresh point
        cov = sorted(
            (r.conv_id, r.turn_idx, r.tool, r.text, r.role)
            for r in ix.lookup("search", covering=True).collect()
        )
        via_base = sorted(
            (r.conv_id, r.turn_idx, r.tool, r.text, r.role)
            for r in base.read()
            .filter(F.col("tool") == "search")
            .select("conv_id", "turn_idx", "tool", "text", "role")
            .collect()
        )
        assert cov == via_base, i


def test_covering_same_value_update_refreshes_payload(spark, tmp_path):
    # tool unchanged but text changes: the pref tie keeps the posting
    # AND the covered payload must be the NEW row's
    base = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=2)
    ix = SecondaryIndex(
        spark, str(tmp_path / "ix"), base, "tool", include_cols=["text"]
    )
    apply_events_batch(_mk(spark, [_ev(0, "insert", "a", 1, "search", 1)]), base, "b1")
    ix.refresh()
    apply_events_batch(_mk(spark, [_ev(1, "update", "a", 1, "search", 2)]), base, "b2")
    ix.refresh()
    rows = ix.lookup("search", covering=True).collect()
    assert [(r.conv_id, r.text) for r in rows] == [("a", "t1")]


def test_covering_rejections(spark, tmp_path):
    base = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=2)
    with pytest.raises(ValueError, match="already part"):
        SecondaryIndex(
            spark, str(tmp_path / "ix1"), base, "tool", include_cols=["conv_id"]
        )
    ix = SecondaryIndex(
        spark, str(tmp_path / "ix2"), base, "tool", include_cols=["text"]
    )
    apply_events_batch(_mk(spark, [_ev(0, "insert", "a", 1, "search", 1)]), base, "b1")
    ix.refresh()
    with pytest.raises(ValueError, match="not covered"):
        ix.lookup("search", covering=True, columns=["role"])


def test_config_rejections(spark, tmp_path):
    patch = ParquetSnapshotSink(
        spark, str(tmp_path / "p"), num_buckets=2, patch_cols=["text"]
    )
    with pytest.raises(ValueError, match="row-level"):
        SecondaryIndex(spark, str(tmp_path / "ix1"), patch, "tool")
    base = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=2)
    with pytest.raises(ValueError, match="key column"):
        SecondaryIndex(spark, str(tmp_path / "ix2"), base, "conv_id")
