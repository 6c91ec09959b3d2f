"""Generalized per-column zone maps: declared ``stats_cols`` footer
bounds in the manifest + ``read(where=...)`` chain skipping.

Exactness is the interesting part (see _where_skips_chain): payload
predicates may only skip WHOLE bucket chains — element-level skipping
could drop a key's true winner and resurrect an older matching row —
and patch mode needs the stricter one-conjunct-refuted-by-every-
element rule because carry-forward sources columns across elements.
Reference anchor: this is R2's token-level skip
(JsonValueParser.java:176-185) lifted to the storage layer, the
Iceberg lower/upper_bounds shape.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink


def _rows(spark, n=240):
    # tenant-sharded rows: score range is a function of the tenant,
    # tenant is the bucket key — the layout where chain skipping fires
    out = [
        (
            f"t{i % 6}",
            f"c{i % 24}",
            i % 5,
            f"r{i % 3}",
            f"text {i}",
            (i % 6) * 1000 + (i * 7) % 500,
            datetime.datetime(2025, 1, 1, 0, i % 60, (i * 3) % 60),
            "delete" if i % 17 == 9 else "upsert",
            i,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        out,
        "tenant string, conv_id string, turn_idx int, role string, "
        "text string, score long, ts timestamp, op string, seq long",
    )


def _mk(spark, tmp_path, **kw):
    return ParquetSnapshotSink(
        spark,
        str(tmp_path / "t"),
        num_buckets=6,
        keys=["tenant", "conv_id", "turn_idx"],
        order_cols=["ts", "seq"],
        mode="mor",
        stats_cols=["score"],
        **kw,
    )


def _oracle(df, pred):
    w = (
        df.groupBy("tenant", "conv_id", "turn_idx")
        .agg(
            F.max_by(
                F.struct("op", "role", "text", "score", "ts"),
                F.struct("ts", "seq"),
            ).alias("s")
        )
        .select("tenant", "conv_id", "turn_idx", "s.*")
        .filter(F.col("op") != "delete")
        .drop("op")
    )
    return sorted(map(tuple, w.filter(pred).collect()))


def test_where_matches_oracle_and_skips_chains(spark, tmp_path):
    df = _rows(spark).localCheckpoint()
    sink = _mk(spark, tmp_path)
    for i in range(3):
        sink.apply(df.filter(F.col("seq") % 3 == i), f"b{i}")

    got = sorted(
        map(
            tuple,
            sink.read(where=[("score", "<", 1000)])
            .select("tenant", "conv_id", "turn_idx", "role", "text", "score", "ts")
            .collect(),
        )
    )
    assert got == _oracle(df, F.col("score") < 1000)
    assert got, "fixture must match some rows"

    # the skip decision actually fires on the committed stats: at
    # least one bucket chain is provably outside the predicate
    m = sink.current_manifest()
    conjs = sink._where_conjuncts([("score", "<", 1000)])
    skipped = [
        b
        for b in m["buckets"]
        if sink._where_skips_chain(sink._paths_of(m, b), conjs, m, False)
    ]
    assert skipped, "tenant-sharded layout must skip whole chains"
    # and no skipped chain held a surviving row (consistency of the
    # decision with the residual-filtered result)
    kept_buckets = {sink.bucket_of(t) for (t, *_rest) in got}
    assert kept_buckets.isdisjoint({int(b) for b in skipped})


def test_where_update_moves_winner_out_of_range(spark, tmp_path):
    """A key whose OLD row matches the predicate but whose winner does
    not must NOT surface — the failure mode element-level pruning
    would cause."""
    sink = ParquetSnapshotSink(
        spark,
        str(tmp_path / "w"),
        num_buckets=2,
        keys=["conv_id", "turn_idx"],
        order_cols=["ts", "seq"],
        mode="mor",
        stats_cols=["score"],
    )
    t0 = datetime.datetime(2025, 1, 1)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "conv_id string, turn_idx int, score long, ts timestamp, op string, seq long"
    )
    sink.apply(mk([("a", 0, 10, t0, "upsert", 1), ("b", 0, 20, t0, "upsert", 2)]), "b0")
    later = t0 + datetime.timedelta(hours=1)
    sink.apply(mk([("a", 0, 5000, later, "upsert", 3)]), "b1")
    got = sorted(
        map(tuple, sink.read(where=[("score", "<", 100)]).select("conv_id", "score").collect())
    )
    assert got == [("b", 20)]
    # and the >= side returns the moved winner exactly once
    got2 = sorted(
        map(tuple, sink.read(where=[("score", ">=", 100)]).select("conv_id", "score").collect())
    )
    assert got2 == [("a", 5000)]


def test_where_ops_and_conjunction(spark, tmp_path):
    df = _rows(spark).localCheckpoint()
    sink = _mk(spark, tmp_path)
    sink.apply(df, "b0")
    for pred, col_pred in [
        ([("score", ">=", 3000), ("score", "<", 4000)],
         (F.col("score") >= 3000) & (F.col("score") < 4000)),
        ([("score", "=", 2007)], F.col("score") == 2007),
        ([("role", ">", "r1")], F.col("role") > "r1"),
    ]:
        got = sorted(
            map(
                tuple,
                sink.read(where=pred)
                .select("tenant", "conv_id", "turn_idx", "role", "text", "score", "ts")
                .collect(),
            )
        )
        assert got == _oracle(df, col_pred), pred


def test_where_patch_mode_stricter_rule(spark, tmp_path):
    """Patch mode: resolved columns can come from different elements —
    the skip must use the one-conjunct-refuted-everywhere rule. The
    fixture's per-element score ranges would satisfy the row-level
    any-conjunct rule while the resolved rows still match."""
    sink = ParquetSnapshotSink(
        spark,
        str(tmp_path / "p"),
        num_buckets=1,
        keys=["conv_id"],
        order_cols=["ts", "seq"],
        mode="mor",
        patch_cols=["score", "label"],
        stats_cols=["score"],
        unchanged_marker=None,
    )
    t0 = datetime.datetime(2025, 1, 1)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "conv_id string, score long, label string, ts timestamp, op string, seq long"
    )
    # element 1: score carried (low), label absent
    sink.apply(mk([("k", 50, None, t0, "upsert", 1)]), "b0")
    # element 2: label carried, score absent (NULL = not carried)
    sink.apply(
        mk([("k", None, "L", t0 + datetime.timedelta(hours=1), "upsert", 2)]),
        "b1",
    )
    # resolved row: score=50 (carry-forward from element 1), label=L
    got = sink.read(where=[("score", "<", 100)]).select("conv_id", "score", "label").collect()
    assert [tuple(r) for r in got] == [("k", 50, "L")]


def test_where_validation(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink.apply(_rows(spark, 30), "b0")
    with pytest.raises(ValueError):
        sink.read(where=[("score", "!=", 1)])
    with pytest.raises(ValueError):
        sink.read(where=[("score", "=", None)])
    with pytest.raises(ValueError):
        sink.read(where=[("nope", "=", 1)]).collect()


def test_where_with_column_projection(spark, tmp_path):
    df = _rows(spark).localCheckpoint()
    sink = _mk(spark, tmp_path)
    sink.apply(df, "b0")
    got = sink.read(where=[("score", "<", 1000)], columns=["role"])
    assert set(got.columns) == {"tenant", "conv_id", "turn_idx", "role"}
    want = {
        (t, c, x, r)
        for (t, c, x, r, _txt, _s, _ts) in _oracle(df, F.col("score") < 1000)
    }
    assert set(map(tuple, got.collect())) == want
