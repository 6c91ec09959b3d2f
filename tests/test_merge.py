"""Declarative MERGE INTO (sinks/merge.py): imperative clause
semantics (update/delete/insert decided by the clauses, not LWW event
order) over the same bucketed manifest protocol as the streaming
apply — idempotent on batch_id, copy-on-write of only the affected
buckets, tombstones count as NOT MATCHED, and merged rows re-enter the
LWW algebra at (source ts, target seq + 1) so replay stays coherent."""

import pytest
from pyspark.sql import functions as F

from embulk_util_json_spark.sinks.merge import merge_into
from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
from embulk_util_json_spark.streaming.runner import apply_events_batch

SRC_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts string"
)


def _ev(seq, op, conv, turn, sec, text=None):
    return (
        seq,
        f'{{"op":"{op}","ts":"2026-01-01 00:00:{sec:02d}.000000",'
        f'"data":{{"conv_id":"{conv}","turn_idx":{turn},"role":"r",'
        f'"text":"{text or f"t{seq}"}","tool":"x"}}}}',
    )


def _mk(spark, rows):
    return spark.createDataFrame(rows, "seq long, event_json string")


def _src(spark, rows):
    return spark.createDataFrame(rows, SRC_SCHEMA).withColumn(
        "ts", F.to_timestamp("ts")
    )


def _state(sink):
    return sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool)
        for r in sink.read().collect()
    )


def _seed(spark, tmp_path, n=4, **kw):
    sink = ParquetSnapshotSink(
        spark, str(tmp_path / "t"), num_buckets=4, mode="mor", **kw
    )
    apply_events_batch(
        _mk(spark, [_ev(i, "insert", f"c{i}", 1, i + 1) for i in range(n)]),
        sink,
        "seed",
    )
    return sink


def test_merge_update_insert_delete_clauses(spark, tmp_path):
    sink = _seed(spark, tmp_path)
    src = _src(
        spark,
        [
            ("c0", 1, "R", "updated", "y", "2026-01-02 00:00:00"),  # matched
            ("c1", 1, "R", "doomed", "y", "2026-01-02 00:00:00"),  # matched+del
            ("c9", 1, "R", "fresh", "y", "2026-01-02 00:00:00"),  # unmatched
        ],
    )
    res = merge_into(
        sink,
        src,
        "m1",
        when_matched_delete="s.text = 'doomed'",
        when_matched_update=True,
        when_not_matched_insert=True,
    )
    assert (res["matched_updated"], res["matched_deleted"], res["inserted"]) == (
        1, 1, 1,
    )
    assert _state(sink) == [
        ("c0", 1, "R", "updated", "y"),
        ("c2", 1, "r", "t2", "x"),
        ("c3", 1, "r", "t3", "x"),
        ("c9", 1, "R", "fresh", "y"),
    ]
    # the delete is a CDC tombstone: the change feed window sees it
    feed = sink.read_changes(res["version"] - 1)
    ops = {(r.conv_id, r.op) for r in feed.collect()}
    assert ("c1", "delete") in ops


def test_merge_dict_update_exprs_and_passthrough(spark, tmp_path):
    """{col: expr} updates only the listed columns (exprs may read
    both sides); unlisted payload columns keep the target value."""
    sink = _seed(spark, tmp_path, n=2)
    src = _src(spark, [("c0", 1, "ignored", "NEW", "ignored", "2026-01-02 00:00:00")])
    merge_into(
        sink,
        src,
        "m1",
        when_matched_update={"text": "concat(t.text, '+', s.text)"},
        when_not_matched_insert=False,
    )
    assert _state(sink) == [
        ("c0", 1, "r", "t0+NEW", "x"),  # role/tool kept from target
        ("c1", 1, "r", "t1", "x"),
    ]


def test_merge_tombstone_is_not_matched(spark, tmp_path):
    """A key whose current state is a delete tombstone counts as NOT
    matched (Delta/Iceberg semantics): the insert clause revives it,
    the update/delete clauses never see it."""
    sink = _seed(spark, tmp_path, n=2)
    apply_events_batch(_mk(spark, [_ev(10, "delete", "c0", 1, 30)]), sink, "del")
    src = _src(spark, [("c0", 1, "R", "revived", "y", "2026-01-02 00:00:00")])
    res = merge_into(sink, src, "m1", when_matched_delete=True)
    assert (res["matched_deleted"], res["inserted"]) == (0, 1)
    assert ("c0", 1, "R", "revived", "y") in _state(sink)


def test_merge_idempotent_and_empty_source(spark, tmp_path):
    sink = _seed(spark, tmp_path, n=2)
    src = _src(spark, [("c0", 1, "R", "once", "y", "2026-01-02 00:00:00")])
    merge_into(sink, src, "m1")
    before = _state(sink)
    assert merge_into(sink, src, "m1").get("skipped")  # redelivery no-ops
    assert _state(sink) == before
    # an empty source still commits its batch_id (exactly-once bookkeeping)
    res = merge_into(sink, src.limit(0), "m2")
    assert res["change_rows"] == 0
    assert "m2" in sink.applied_batch_ids()


def test_merge_validates_source(spark, tmp_path):
    sink = _seed(spark, tmp_path, n=1)
    dup = _src(
        spark,
        [
            ("c0", 1, "a", "x", None, "2026-01-02 00:00:00"),
            ("c0", 1, "b", "y", None, "2026-01-02 00:00:00"),
        ],
    )
    with pytest.raises(ValueError, match="cardinality"):
        merge_into(sink, dup, "m1")
    with pytest.raises(ValueError, match="missing key"):
        merge_into(sink, dup.drop("turn_idx"), "m2")
    with pytest.raises(ValueError, match="missing payload"):
        merge_into(sink, dup.limit(1).drop("tool"), "m3")


def test_merge_rejects_patch_mode(spark, tmp_path):
    sink = ParquetSnapshotSink(
        spark,
        str(tmp_path / "p"),
        num_buckets=2,
        patch_cols=["role", "text", "tool"],
    )
    with pytest.raises(ValueError, match="row-level"):
        merge_into(sink, _src(spark, []), "m1")


def test_merge_rewrites_only_affected_buckets(spark, tmp_path):
    """Copy-on-write is bucket-pruned: buckets without a source key
    keep their manifest paths untouched (a 1%-of-keys merge rewrites
    ~1% of a 100 TB table, not all of it)."""
    sink = _seed(spark, tmp_path, n=8)
    before = sink.current_manifest()["buckets"]
    hit = sink.bucket_of("c0")
    merge_into(
        sink,
        _src(spark, [("c0", 1, "R", "upd", "y", "2026-01-02 00:00:00")]),
        "m1",
    )
    after = sink.current_manifest()["buckets"]
    assert after[str(hit)] != before[str(hit)]
    for b, paths in before.items():
        if b != str(hit):
            assert after[b] == paths, f"untouched bucket {b} was rewritten"


def test_merge_replay_interaction(spark, tmp_path):
    """Merged rows sit at (source ts, target seq + 1): a replayed
    pre-merge event loses (even at the same ts, via the +1 tie-break
    against the exact row replaced); a genuinely newer event wins."""
    sink = _seed(spark, tmp_path, n=2)
    merge_into(
        sink,
        _src(spark, [("c0", 1, "r", "merged", "x", "2026-01-01 00:00:01.000000")]),
        "m1",
    )  # same ts as the seeded c0 row -> +1 tie-break must carry it
    apply_events_batch(_mk(spark, [_ev(0, "insert", "c0", 1, 1)]), sink, "replay")
    assert ("c0", 1, "r", "merged", "x") in _state(sink)
    apply_events_batch(
        _mk(spark, [_ev(20, "update", "c0", 1, 40, text="newer")]), sink, "b9"
    )
    assert ("c0", 1, "r", "newer", "x") in _state(sink)
