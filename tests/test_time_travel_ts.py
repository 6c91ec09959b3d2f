"""Timestamp-based time travel (`FOR SYSTEM_TIME AS OF` / Iceberg
snapshot-at-timestamp): every commit stamps `committed_at` (writer wall
clock); `version_at_ts` resolves an instant to the version visible then
under a RUNNING-MAX of stamps (monotone in version even if the wall
clock steps back); `read(at_ts=...)` == `read(at_version=resolved)`.

Reference anchor: the reference has no storage layer — versioned reads
are an engine addition over the same immutable-manifest chain that
backs `read(at_version=...)` (SURVEY §2.4d time travel).
"""

import datetime

import pytest
from pyspark.sql import functions as F

from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink


def _rows(spark, lo, hi):
    out = [
        (
            f"c{i % 4}",
            i % 3,
            "assistant",
            f"text {i}",
            datetime.datetime(2025, 1, 1) + datetime.timedelta(seconds=i),
            "upsert",
            i,
        )
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        out,
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, op string, seq long",
    )


def _mk(spark, tmp_path):
    return ParquetSnapshotSink(
        spark,
        str(tmp_path / "t"),
        num_buckets=4,
        keys=["conv_id", "turn_idx"],
        order_cols=["ts", "seq"],
        mode="mor",
    )


def _stamp(sink, v):
    return float(sink.manifest_at(v)["committed_at"])


def test_version_at_ts_resolves_and_reads(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.apply(_rows(spark, 0, 10), "b0")
    sink.apply(_rows(spark, 10, 20), "b1")
    sink.apply(_rows(spark, 20, 30), "b2")
    s1, s2, s3 = (_stamp(sink, v) for v in (1, 2, 3))
    assert s1 <= s2 <= s3  # single writer, monotone wall clock here
    # an instant strictly between two commits sees the earlier version
    assert sink.version_at_ts((s1 + s2) / 2) == 1
    assert sink.version_at_ts((s2 + s3) / 2) == 2
    assert sink.version_at_ts(s3 + 60.0) == 3
    # exact stamp is inclusive (committed AT t is visible at t)
    assert sink.version_at_ts(s2) == 2
    # read(at_ts) == read(at_version) row-for-row
    mid = (s1 + s2) / 2
    got = sink.read(at_ts=mid)
    want = sink.read(at_version=1)
    assert got.count() == want.count() == 10
    assert got.exceptAll(want).count() == 0
    # datetime input works too
    dt = datetime.datetime.fromtimestamp(mid, tz=datetime.timezone.utc)
    assert sink.version_at_ts(dt) == 1


def test_before_first_commit_and_arg_conflicts(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="empty"):
        sink.version_at_ts(0.0)
    sink.apply(_rows(spark, 0, 10), "b0")
    with pytest.raises(ValueError, match="no version committed"):
        sink.version_at_ts(_stamp(sink, 1) - 60.0)
    with pytest.raises(ValueError, match="not both"):
        sink.read(at_version=1, at_ts=_stamp(sink, 1))


def test_rollback_stamps_commit_time_not_restored_time(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.apply(_rows(spark, 0, 10), "b0")
    sink.apply(_rows(spark, 10, 20), "b1")
    sink.rollback(1)
    s3 = _stamp(sink, 3)
    # the rollback version carries ITS OWN commit time (>= the bad
    # version's), so "as of now" sees the restored state, not the
    # detour — and the detour is still reachable between s2 and s3
    assert s3 >= _stamp(sink, 2)
    assert sink.version_at_ts(s3 + 60.0) == 3
    assert sink.read(at_ts=s3 + 60.0).count() == 10


def test_read_changes_timestamp_window(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.apply(_rows(spark, 0, 10), "b0")
    sink.apply(_rows(spark, 10, 20), "b1")
    sink.apply(_rows(spark, 20, 30), "b2")
    s1, s2, s3 = (_stamp(sink, v) for v in (1, 2, 3))
    # window anchored between commit 1 and 2: changes of v2..v3
    got = sink.read_changes(since_ts=(s1 + s2) / 2)
    want = sink.read_changes(1)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    # until_ts caps the window at the version visible then
    got2 = sink.read_changes(since_ts=(s1 + s2) / 2, until_ts=(s2 + s3) / 2)
    want2 = sink.read_changes(1, 2)
    assert got2.count() == want2.count()
    assert got2.exceptAll(want2).count() == 0
    # before the first commit = full feed from the beginning
    full = sink.read_changes(since_ts=s1 - 60.0)
    assert full.count() == sink.read_changes(0).count()
    # conflicts and missing args are refused
    with pytest.raises(ValueError, match="not both"):
        sink.read_changes(from_version=1, since_ts=s1)
    with pytest.raises(ValueError, match="not both"):
        sink.read_changes(1, to_version=2, until_ts=s2)
    with pytest.raises(ValueError, match="from_version or since_ts"):
        sink.read_changes()


def test_vacuum_older_than_ts(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    for i in range(4):
        sink.apply(_rows(spark, i * 10, (i + 1) * 10), f"b{i}")
    s2, s3 = _stamp(sink, 2), _stamp(sink, 3)
    cut = (s2 + s3) / 2
    # versions visible at `cut` and later survive: v2 (visible at cut),
    # v3, v4; v1 is reclaimable
    r = sink.vacuum(older_than_ts=cut, protect_cursors=False)
    assert r["removed_versions"] == 1
    assert [x.version for x in sink.snapshots().collect()] == [2, 3, 4]
    # an as-of read at the cut still resolves (to v2's state)
    got = sink.read(at_ts=cut)
    want = sink.read(at_version=2)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    # an instant before the first commit keeps everything
    r2 = sink.vacuum(older_than_ts=0.0, protect_cursors=False)
    assert r2["removed_versions"] == 0


def test_snapshots_expose_committed_at(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.apply(_rows(spark, 0, 10), "b0")
    sink.apply(_rows(spark, 10, 20), "b1")
    snaps = sink.snapshots().orderBy("version").collect()
    assert [r.version for r in snaps] == [1, 2]
    assert all(r.committed_at is not None for r in snaps)
    assert snaps[0].committed_at <= snaps[1].committed_at
    assert (
        abs(snaps[1].committed_at - _stamp(sink, 2)) < 1e-6
    )
