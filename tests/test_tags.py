"""Snapshot tags (Iceberg tag refs): named IMMUTABLE pointers to
committed versions. Unlike a branch a tag never advances; unlike a
bare version number it survives vacuum — tagged versions (manifest +
data) are pinned outside the keep window, so `read(at_tag=...)`
reproduces the exact table years of commits later.

Reference anchor: the reference has no storage layer — this is lake
maintenance/reproducibility surface the host pipeline owns
(SURVEY §2.4d branches / time travel).
"""

import datetime

import pytest

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


def test_tag_reads_exact_version(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.apply(_rows(spark, 0, 10), "b0")
    sink.create_tag("v1-release")
    sink.apply(_rows(spark, 10, 30), "b1")
    got = sink.read(at_tag="v1-release")
    want = sink.read(at_version=1)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    # explicit at_version form
    sink.create_tag("first", at_version=1)
    assert sink.read(at_tag="first").count() == want.count()
    assert {t for t in sink.tags()} == {"v1-release", "first"}


def test_tags_are_immutable_refs(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.apply(_rows(spark, 0, 10), "b0")
    sink.create_tag("gold")
    with pytest.raises(ValueError, match="already exists"):
        sink.create_tag("gold")
    sink.apply(_rows(spark, 10, 20), "b1")
    # repoint = delete + create, deliberately loud
    sink.delete_tag("gold")
    sink.create_tag("gold")
    assert sink.tags()["gold"]["version"] == 2
    with pytest.raises(ValueError, match="no such tag"):
        sink.delete_tag("never")
    with pytest.raises(ValueError, match="committed"):
        sink.create_tag("future", at_version=99)
    with pytest.raises(ValueError, match="invalid tag name"):
        sink.create_tag("a/b")
    with pytest.raises(ValueError, match="only one of"):
        sink.read(at_tag="gold", at_version=1)


def test_tagged_version_survives_vacuum(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.apply(_rows(spark, 0, 10), "b0")
    sink.create_tag("trained-on")
    for i in range(1, 4):
        sink.apply(_rows(spark, i * 10, (i + 1) * 10), f"b{i}")
    want = sink.read(at_version=1).collect()
    r = sink.vacuum(keep_versions=1, protect_cursors=False)
    # untagged middles expired; the tagged v1 is pinned
    assert r["removed_versions"] == 2
    assert [x.version for x in sink.snapshots().collect()] == [1, 4]
    got = sink.read(at_tag="trained-on")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want))
    # drop the tag: the NEXT vacuum may reclaim it
    sink.delete_tag("trained-on")
    r2 = sink.vacuum(keep_versions=1, protect_cursors=False)
    assert r2["removed_versions"] == 1
    assert [x.version for x in sink.snapshots().collect()] == [4]


def test_tag_is_branch_scoped(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.apply(_rows(spark, 0, 10), "b0")
    br = sink.create_branch("audit")
    br.apply(_rows(spark, 10, 20), "b1")
    br.create_tag("audit-cut")
    # visible table-wide, readable only from the owning branch
    assert sink.tags()["audit-cut"]["branch"] == "audit"
    with pytest.raises(ValueError, match="pins branch"):
        sink.read(at_tag="audit-cut")
    assert br.read(at_tag="audit-cut").count() == br.read(at_version=2).count()
