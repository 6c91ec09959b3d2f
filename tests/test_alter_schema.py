"""ALTER TABLE ADD COLUMN [DEFAULT] / DROP COLUMN as metadata-only
commits over the snapshot sink.

ADD ... DEFAULT is an EXISTENCE default (Iceberg initial-default /
SQL-standard semantics): files written before the ADD physically lack
the column and read as the default; files written after keep stored
values, including explicit NULL; an INSERT that omits the column gets
the default. No file is rewritten — absence in the file IS the
encoding, so the default is frozen at ADD time.

DROP hides the physical column from every read/feed/rewrite without
touching files; a re-add allocates a fresh physical name via the
column mapping so retired bytes can never resurface.

Reference anchor: the capture spec adds/renames output columns
declaratively (CapturingPointers.java builder); these lift the same
schema authority over STORED history without rewrite.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink


def _rows(spark, lo, hi, extra_col=None):
    base = "conv_id string, turn_idx int, role string, text string, ts timestamp, op string, seq long"
    out = []
    for i in range(lo, hi):
        r = [
            f"c{i % 6}",
            i % 4,
            "assistant",
            f"text {i}",
            datetime.datetime(2025, 1, 1) + datetime.timedelta(seconds=i % 3600),
            "upsert",
            i,
        ]
        if extra_col:
            r.append(None if i % 5 == 0 else i * 100)
        out.append(tuple(r))
    ddl = base + (f", {extra_col} long" if extra_col else "")
    return spark.createDataFrame(out, ddl)


def _mk(spark, tmp_path, mode="mor", name="t", **kw):
    return ParquetSnapshotSink(
        spark,
        str(tmp_path / f"{name}_{mode}"),
        num_buckets=4,
        keys=["conv_id", "turn_idx"],
        order_cols=["ts", "seq"],
        mode=mode,
        **kw,
    )


@pytest.mark.parametrize("mode", ["mor", "mow"])
def test_add_column_default_existence_semantics(spark, tmp_path, mode):
    sink = _mk(spark, tmp_path, mode)
    sink.apply(_rows(spark, 0, 60), "b0")
    r = sink.add_column("score", "bigint", default=7)
    assert r["physical"] == "score"
    sink.apply(_rows(spark, 100, 160, extra_col="score"), "b1")

    final = sink.read()
    rows = {(x.conv_id, x.turn_idx): x.score for x in final.collect()}
    # every key is overwritten by b1 (seq 100..159 beats 0..59), so all
    # winners carry b1's stored values — NULL where i%5==0
    for (c, t), score in rows.items():
        i = max(
            i for i in range(100, 160) if f"c{i % 6}" == c and i % 4 == t
        )
        assert score == (None if i % 5 == 0 else i * 100), (c, t, score)

    # pre-ADD winners read the default: time-travel style check via a
    # second table where b1 only covers half the keyspace
    sink2 = _mk(spark, tmp_path, mode, name="half")
    sink2.apply(_rows(spark, 0, 60), "b0")
    sink2.add_column("score", "bigint", default=7)
    newer = _rows(spark, 100, 160, extra_col="score").filter(
        F.col("conv_id") < "c3"
    )
    sink2.apply(newer, "b1")
    got = {(x.conv_id, x.turn_idx): x.score for x in sink2.read().collect()}
    for (c, t), score in got.items():
        if c >= "c3":  # winner predates the ADD -> existence default
            assert score == 7, (c, t, score)


@pytest.mark.parametrize("mode", ["mor", "mow"])
def test_add_column_insert_omitting_column_gets_default(spark, tmp_path, mode):
    sink = _mk(spark, tmp_path, mode)
    sink.apply(_rows(spark, 0, 30), "b0")
    sink.add_column("score", "bigint", default=42)
    # a post-ADD batch that OMITS the column: absence -> default
    sink.apply(_rows(spark, 100, 130), "b1")
    assert sink.read().filter(F.col("score") != 42).count() == 0
    assert sink.read().filter(F.col("score").isNull()).count() == 0


def test_add_column_no_files_rewritten_and_compact_preserves(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 40), "b0")
    m0 = sink.current_manifest()
    paths0 = set(sink._all_paths(m0))
    sink.add_column("score", "bigint", default=5)
    m1 = sink.current_manifest()
    assert set(sink._all_paths(m1)) == paths0  # metadata-only
    # pre-ADD files physically lack the column
    assert all(
        "score" not in {f.name for f in sink._path_schema(p).fields}
        for p in paths0
    )
    sink.apply(_rows(spark, 100, 140, extra_col="score"), "b1")
    before = sorted(map(tuple, sink.read().collect()))
    sink.compact()
    after = sorted(map(tuple, sink.read().collect()))
    assert before == after
    # the rewrite materialized the default into storage (read-equal)
    assert all(
        "score" in {f.name for f in sink._path_schema(p).fields}
        for p in sink._all_paths(sink.current_manifest())
    )


def test_add_column_time_travel_and_rollback(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 30), "b0")  # v1
    v_pre = sink.current_version()
    sink.add_column("score", "bigint", default=9)  # v2
    assert "score" in sink.read().columns
    assert "score" not in sink.read(at_version=v_pre).columns
    sink.rollback(v_pre)
    assert "score" not in sink.read().columns
    # re-add after rollback works and the default applies again
    sink.add_column("score", "bigint", default=11)
    assert sink.read().filter(F.col("score") != 11).count() == 0


def test_add_column_validation(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    with pytest.raises(ValueError, match="non-empty"):
        sink.add_column("x", "bigint", default=1)
    sink.apply(_rows(spark, 0, 10), "b0")
    with pytest.raises(ValueError, match="merge layout"):
        sink.add_column("ts", "timestamp")
    with pytest.raises(ValueError, match="already exists"):
        sink.add_column("text", "string")
    with pytest.raises(ValueError, match="invalid column name"):
        sink.add_column("bad-name", "string")
    with pytest.raises(Exception):
        sink.add_column("x", "no_such_type", default=1)


@pytest.mark.parametrize("mode", ["mor", "mow"])
def test_drop_column_hidden_everywhere(spark, tmp_path, mode):
    sink = _mk(spark, tmp_path, mode)
    sink.apply(_rows(spark, 0, 40), "b0")
    v_pre = sink.current_version()
    r = sink.drop_column("text")
    assert r["physical"] == "text"
    out = sink.read()
    assert "text" not in out.columns
    assert out.count() == sink.read(at_version=v_pre).count()
    # time travel to pre-drop shows it again
    assert "text" in sink.read(at_version=v_pre).columns
    # feeds exclude it
    feed = sink.read_changes(0)
    assert "text" not in feed.columns
    # files untouched (metadata-only): physical column still on disk
    assert all(
        "text" in {f.name for f in sink._path_schema(p).fields}
        for p in sink._all_paths(sink.current_manifest())
    )
    # writes still carrying it are refused
    with pytest.raises(ValueError, match="dropped"):
        sink.apply(_rows(spark, 100, 110), "b1")
    # but a batch without it is fine
    sink.apply(_rows(spark, 100, 110).drop("text"), "b1")
    assert "text" not in sink.read().columns


def test_drop_then_compact_sheds_physical_bytes(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 40), "b0")
    sink.drop_column("text")
    sink.apply(_rows(spark, 100, 140).drop("text"), "b1")
    sink.compact()
    assert all(
        "text" not in {f.name for f in sink._path_schema(p).fields}
        for p in sink._all_paths(sink.current_manifest())
    )
    assert "text" not in sink.read().columns


def test_drop_readd_fresh_physical_no_resurrection(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 40), "b0")  # text = "text i"
    sink.drop_column("text")
    r = sink.add_column("text", "string", default="REDACTED")
    assert r["physical"] != "text"  # fresh physical name
    out = sink.read()
    assert "text" in out.columns
    # every pre-readd row reads the NEW default, never the old bytes
    assert out.filter(F.col("text") != "REDACTED").count() == 0
    # new writes land in the fresh physical via the mapping
    sink.apply(_rows(spark, 100, 120), "b1")
    vals = {x.text for x in sink.read().collect()}
    assert all(v == "REDACTED" or v.startswith("text 1") for v in vals)
    # old physical still shed from reads even though files carry it
    m = sink.current_manifest()
    assert "text" in m.get("dropped_columns", [])


def test_rollback_across_drop_restores_column(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 20), "b0")
    v_pre = sink.current_version()
    sink.drop_column("text")
    assert "text" not in sink.read().columns
    sink.rollback(v_pre)
    out = sink.read()
    assert "text" in out.columns
    assert out.filter(F.col("text").startswith("text ")).count() == out.count()


def test_rename_then_drop_and_add_then_rename(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 20), "b0")
    sink.rename_column("text", "body")
    sink.drop_column("body")
    assert "body" not in sink.read().columns
    assert "text" not in sink.read().columns
    r = sink.add_column("score", "bigint", default=3)
    sink.rename_column("score", "points")
    out = sink.read()
    assert "points" in out.columns and "score" not in out.columns
    assert out.filter(F.col("points") != 3).count() == 0
    # protected: patch/keys/order still refused by every verb
    with pytest.raises(ValueError, match="merge layout"):
        sink.drop_column("op")


def test_default_with_where_and_purge_predicates(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor", stats_cols=["seq"])
    sink.apply(_rows(spark, 0, 40), "b0")
    sink.add_column("score", "bigint", default=7)
    sink.apply(_rows(spark, 100, 120, extra_col="score"), "b1")
    # residual where= on the defaulted column is exact even though
    # pre-ADD files carry no stats for it (fail-open skip)
    hit = sink.read(where=[("score", "=", 7)])
    manual = sink.read().filter(F.col("score") == 7)
    assert sorted(map(tuple, hit.collect())) == sorted(
        map(tuple, manual.collect())
    )
    # purge by a predicate over the defaulted column
    n_before = sink.read().count()
    n_match = sink.read().filter(F.col("score") == 7).count()
    sink.purge(where=F.col("score") == 7)
    assert sink.read().count() == n_before - n_match
    assert sink.read().filter(F.col("score") == 7).count() == 0


def test_feed_window_spanning_add_is_consistent(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 30), "b0")
    v0 = sink.current_version()
    sink.add_column("score", "bigint", default=7)
    sink.apply(_rows(spark, 100, 115, extra_col="score"), "b1")
    feed = sink.read_changes(v0)
    assert "score" in feed.columns
    # only genuinely-changed keys appear; their score is b1's stored value
    assert feed.count() == sink.read().join(
        _rows(spark, 100, 115).select("conv_id", "turn_idx").distinct(),
        ["conv_id", "turn_idx"],
    ).count()
    # a feed BEFORE the add (to-version lens) lacks the column
    pre = sink.read_changes(0, to_version=v0)
    assert "score" not in pre.columns


def test_empty_window_and_prune_miss_carry_altered_schema(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 20), "b0")
    sink.add_column("score", "bigint", default=7)
    sink.drop_column("text")
    v = sink.current_version()
    # metadata-only window: typed empty feed still shows the altered shape
    feed = sink.read_changes(sink.current_version() - 2, to_version=v)
    # (window covers the two DDL commits only -> no data files)
    assert feed.count() == 0
    assert "score" in feed.columns and "text" not in feed.columns
    # key_eq prune miss carries the altered schema too
    miss = sink.read(key_eq={"conv_id": "zzz-not-there"})
    assert miss.count() == 0
    assert "score" in miss.columns and "text" not in miss.columns
