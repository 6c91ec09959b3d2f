"""Column rename via column mapping: ALTER TABLE RENAME COLUMN as a
METADATA-ONLY commit. Physical names are frozen at a column's first
write (Delta column-mapping / Iceberg field-id semantics in name
form): data files are never rewritten, writes translate logical →
physical at apply entry, reads translate back at exit, and time
travel shows every version under ITS OWN names.

Reference anchor: the reference renames at the capture layer (a JSON
pointer's output column is caller-named, CapturingPointers.java
builder); this lifts renaming over STORED history without rewrite.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink


def _rows(spark, lo, hi, col="score", seq_off=0):
    out = [
        (
            f"c{i % 8}",
            i % 4,
            "assistant",
            f"text {i}",
            i * 10 + seq_off,
            datetime.datetime(2025, 1, 1, 0, 0, i % 3600),
            "upsert",
            i + seq_off,
        )
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        out,
        "conv_id string, turn_idx int, role string, text string, "
        f"{col} long, ts timestamp, op string, seq long",
    )


def _mk(spark, tmp_path, mode, name="t", **kw):
    return ParquetSnapshotSink(
        spark,
        str(tmp_path / f"{name}_{mode}"),
        num_buckets=4,
        keys=["conv_id", "turn_idx"],
        order_cols=["ts", "seq"],
        mode=mode,
        **kw,
    )


def _oracle(spark, frames, out_col):
    u = None
    for f, col in frames:
        f = f.withColumnRenamed(col, out_col)
        u = f if u is None else u.unionByName(f)
    return sorted(
        map(
            tuple,
            u.groupBy("conv_id", "turn_idx")
            .agg(
                F.max_by(
                    F.struct("role", "text", out_col, "ts"),
                    F.struct("ts", "seq"),
                ).alias("s")
            )
            .select("conv_id", "turn_idx", "s.*")
            .collect(),
        )
    )


def _physical_names(sink, col_prefix="score"):
    m = sink.current_manifest()
    return {
        f.name
        for p in sink._all_paths(m)
        for f in sink._path_schema(p).fields
        if f.name.startswith(col_prefix) or f.name in ("points", "rating")
    }


@pytest.mark.parametrize("mode", ["mor", "mow"])
def test_rename_roundtrip_no_rewrite(spark, tmp_path, mode):
    sink = _mk(spark, tmp_path, mode)
    b0 = _rows(spark, 0, 40).localCheckpoint()
    sink.apply(b0, "b0")
    v_pre = sink.current_version()
    files_pre = set(sink._all_paths(sink.current_manifest()))

    sink.rename_column("score", "points")
    # metadata-only: the rename commit references exactly the old files
    assert set(sink._all_paths(sink.current_manifest())) == files_pre

    b1 = _rows(spark, 20, 60, col="points", seq_off=1000).localCheckpoint()
    sink.apply(b1, "b1")

    got = sink.read()
    assert "points" in got.columns and "score" not in got.columns
    rows = sorted(
        map(
            tuple,
            got.select("conv_id", "turn_idx", "role", "text", "points", "ts").collect(),
        )
    )
    assert rows == _oracle(spark, [(b0, "score"), (b1, "points")], "points")
    # every data file — written before AND after the rename — stores
    # the frozen physical name
    assert _physical_names(sink) == {"score"}
    # time travel reads the pre-rename version under its own name
    old = sink.read(at_version=v_pre)
    assert "score" in old.columns and "points" not in old.columns


def test_chained_rename_and_projection(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor", stats_cols=["score"])
    sink.apply(_rows(spark, 0, 40).localCheckpoint(), "b0")
    sink.rename_column("score", "points")
    sink.rename_column("points", "rating")
    sink.apply(_rows(spark, 20, 60, col="rating", seq_off=1000).localCheckpoint(), "b1")

    got = sink.read(columns=["rating"])
    assert set(got.columns) == {"conv_id", "turn_idx", "rating"}
    assert _physical_names(sink) == {"score"}

    # where= on the renamed column rides the physical footer stats
    # (b1's ratings are i*10+1000 for i in 20..60 → 1200..1590)
    hot = sink.read(where=[("rating", ">=", 1400)])
    assert "rating" in hot.columns
    vals = [r.rating for r in hot.select("rating").collect()]
    assert vals and all(v >= 1400 for v in vals)


def test_rename_validation(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 10).localCheckpoint(), "b0")
    with pytest.raises(ValueError):
        sink.rename_column("conv_id", "cid")  # key
    with pytest.raises(ValueError):
        sink.rename_column("ts", "event_ts")  # order col
    with pytest.raises(ValueError):
        sink.rename_column("op", "operation")  # merge layout
    with pytest.raises(ValueError):
        sink.rename_column("nope", "x")  # unknown
    with pytest.raises(ValueError):
        sink.rename_column("score", "text")  # collision (logical)
    with pytest.raises(ValueError):
        sink.rename_column("score", "not a name")
    sink.rename_column("score", "points")
    with pytest.raises(ValueError):
        # 'score' is now a free logical name but still a PHYSICAL name;
        # reusing it would make the read-side rename ambiguous
        sink.rename_column("text", "score")


def test_read_changes_and_rollback_across_rename(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 20).localCheckpoint(), "b0")
    v1 = sink.current_version()
    sink.rename_column("score", "points")
    sink.apply(_rows(spark, 10, 30, col="points", seq_off=1000).localCheckpoint(), "b1")

    # a feed window SPANNING the rename speaks the to-version's names
    feed = sink.read_changes(0)
    assert "points" in feed.columns and "score" not in feed.columns
    assert feed.count() == sink.read().count()

    # rollback to the pre-rename version restores the old names
    sink.rollback(v1)
    back = sink.read()
    assert "score" in back.columns and "points" not in back.columns


def test_purge_predicate_uses_logical_names(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 40).localCheckpoint(), "b0")
    sink.rename_column("score", "points")
    before = sink.read().count()
    assert before == 8  # 8 distinct keys; MOR pre-reduce stores winners
    # winners are i=32..39 (scores 320..390): purge the top half only
    res = sink.purge(where=F.col("points") >= 360)
    assert res["purged_rows"] == 4
    got = sink.read()
    assert got.count() == 4
    assert got.filter(F.col("points") >= 360).count() == 0
    # purge rewrote chains under the frozen physical name
    assert _physical_names(sink) == {"score"}


def test_compact_preserves_mapping(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 40).localCheckpoint(), "b0")
    sink.rename_column("score", "points")
    sink.apply(_rows(spark, 20, 60, col="points", seq_off=1000).localCheckpoint(), "b1")
    before = sorted(map(tuple, sink.read().collect()))
    sink.compact()
    after = sink.read()
    assert "points" in after.columns
    assert sorted(map(tuple, after.collect())) == before
    assert _physical_names(sink) == {"score"}


def test_rename_patch_column(spark, tmp_path):
    sink = _mk(
        spark,
        tmp_path,
        "mor",
        name="p",
        patch_cols=["role", "text", "score"],
    )
    b0 = _rows(spark, 0, 20).localCheckpoint()
    sink.apply(b0, "b0")
    sink.rename_column("score", "points")
    # sparse patch: only 'points' restated; text carries forward
    b1 = (
        _rows(spark, 0, 20, col="points", seq_off=1000)
        .withColumn("text", F.lit(None).cast("string"))
        .localCheckpoint()
    )
    sink.apply(b1, "b1")
    got = sink.read()
    assert "points" in got.columns
    rows = {(r.conv_id, r.turn_idx): (r.points, r.text) for r in got.collect()}
    # points updated by b1, text carried forward from b0
    for (cid, ti), (pts, txt) in rows.items():
        assert pts >= 1000 and txt is not None


def test_branch_inherits_mapping(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 20).localCheckpoint(), "b0")
    sink.rename_column("score", "points")
    br = sink.create_branch("wip")
    assert "points" in br.read().columns
    br.apply(_rows(spark, 10, 30, col="points", seq_off=1000).localCheckpoint(), "b1")
    sink.publish_from(br)
    out = sink.read()
    assert "points" in out.columns
    # the generator's (i%8, i%4) keys correlate: 8 distinct keys total
    assert out.count() == 8
    assert out.filter(F.col("points") >= 1000).count() > 0  # b1 won keys
