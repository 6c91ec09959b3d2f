"""Bloom-filter file skipping for equality predicates.

``analyze_blooms`` builds per-chain-element blooms (one Spark job over
unbloomed elements, metadata-only commit); ``read(where=[(c,'=',v)])``
then refutes elements whose bloom proves the value absent — the
pruning source for high-cardinality scattered columns where min/max
``col_stats`` bounds overlap every probe. Exactness contract is the
same as the bounds (``_where_skips_chain``): refutation is a proof of
absence (no false negatives), a false positive merely fails to prune,
and the residual filter defines the result either way.

Reference anchor: the storage-layer lift of R2's token-level skip
(JsonValueParser.java:176-185), Iceberg write-time bloom properties
run as post-commit ANALYZE.
"""

import datetime

from pyspark.sql import functions as F

from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink


def _rows(spark, n=240):
    # rid is high-cardinality and SCATTERED across batches (seq % 3
    # splits interleave the full range into every element), so every
    # element's [min,max] rid bounds overlap every probe — bounds
    # refute nothing, blooms must carry the prune
    out = [
        (
            f"c{i % 24}",
            i % 5,
            f"r{i % 3}",
            f"text {i}",
            f"rid-{(i * 37) % n:04d}",
            datetime.datetime(2025, 1, 1, 0, i % 60, (i * 3) % 60),
            "delete" if i % 17 == 9 else "upsert",
            i,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        out,
        "conv_id string, turn_idx int, role string, text string, "
        "rid string, ts timestamp, op string, seq long",
    )


def _mk(spark, tmp_path, name="t", **kw):
    return ParquetSnapshotSink(
        spark,
        str(tmp_path / name),
        num_buckets=6,
        keys=["conv_id", "turn_idx"],
        order_cols=["ts", "seq"],
        mode="mor",
        stats_cols=["rid"],
        **kw,
    )


def _fill(spark, sink, n_batches=3):
    df = _rows(spark).localCheckpoint()
    for i in range(n_batches):
        sink.apply(df.filter(F.col("seq") % n_batches == i), f"b{i}")
    return df


def _oracle(df, pred):
    w = (
        df.groupBy("conv_id", "turn_idx")
        .agg(
            F.max_by(
                F.struct("op", "role", "text", "rid", "ts"),
                F.struct("ts", "seq"),
            ).alias("s")
        )
        .select("conv_id", "turn_idx", "s.*")
        .filter(F.col("op") != "delete")
        .drop("op")
    )
    return sorted(map(tuple, w.filter(pred).collect()))


def _skipped_buckets(sink, where):
    m = sink.current_manifest()
    conjs = sink._where_conjuncts(where)
    pos = sink._bloom_probe_positions(m, where, conjs)
    return {
        b
        for b in m["buckets"]
        if sink._where_skips_chain(sink._paths_of(m, b), conjs, m, False, pos)
    }


def test_bloom_prunes_where_bounds_cannot(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    df = _fill(spark, sink)
    # a value that survives as some key's LWW winner
    probe = (
        sink.read().filter(F.col("rid").isNotNull())
        .orderBy("conv_id", "turn_idx").select("rid").first()["rid"]
    )
    where = [("rid", "=", probe)]
    # scattered layout: bounds alone refute nothing
    assert not _skipped_buckets(sink, where), "fixture must defeat bounds"

    res = sink.analyze_blooms()
    assert res["elements_bloomed"] > 0 and res["version"] == 4
    skipped = _skipped_buckets(sink, where)
    assert skipped, "blooms must refute buckets not holding the value"

    got = sorted(
        map(
            tuple,
            sink.read(where=where)
            .select("conv_id", "turn_idx", "role", "text", "rid", "ts")
            .collect(),
        )
    )
    assert got == _oracle(df, F.col("rid") == probe)
    assert got, "probe value must match at least one winner"
    # skip decision consistent with the result
    kept = {sink.bucket_of(c) for (c, *_r) in got}
    assert kept.isdisjoint({int(b) for b in skipped})


def test_bloom_absent_value_skips_every_chain_both_modes(spark, tmp_path):
    for mode_kw, name in (({}, "row"), ({"patch_cols": ["text", "rid", "role"]}, "patch")):
        sink = _mk(spark, tmp_path, name=name, **mode_kw)
        _fill(spark, sink)
        sink.analyze_blooms()
        where = [("rid", "=", "rid-no-such-value")]
        m = sink.current_manifest()
        conjs = sink._where_conjuncts(where)
        pos = sink._bloom_probe_positions(m, where, conjs)
        patch = bool(sink.patch_cols)
        skipped = {
            b
            for b in m["buckets"]
            if sink._where_skips_chain(
                sink._paths_of(m, b), conjs, m, patch, pos
            )
        }
        assert skipped == set(m["buckets"]), f"{name}: all chains must skip"
        assert sink.read(where=where).count() == 0


def test_bloom_tiny_filter_false_positives_harmless(spark, tmp_path):
    sink = _mk(spark, tmp_path, name="fp")
    df = _fill(spark, sink)
    sink.analyze_blooms(bits=64, hashes=2)  # saturated: FPs guaranteed
    probe = df.filter(F.col("op") != "delete").select("rid").first()["rid"]
    got = sorted(
        map(
            tuple,
            sink.read(where=[("rid", "=", probe)])
            .select("conv_id", "turn_idx", "role", "text", "rid", "ts")
            .collect(),
        )
    )
    assert got == _oracle(df, F.col("rid") == probe)


def test_bloom_carry_forward_and_bounded_growth(spark, tmp_path):
    sink = _mk(spark, tmp_path, name="carry")
    df = _fill(spark, sink)
    sink.analyze_blooms()
    bloomed = set(sink.current_manifest()["blooms"])
    assert bloomed

    # a further apply: blooms carry for retained paths, new paths
    # unbloomed (fail-open) — and the read stays exact
    extra = df.withColumn("seq", F.col("seq") + 10_000).withColumn(
        "ts", F.col("ts") + F.expr("interval 1 hour")
    )
    sink.apply(extra.filter(F.col("conv_id") == "c1"), "b3")
    m = sink.current_manifest()
    assert set(m["blooms"]) == bloomed, "retained paths keep their blooms"
    probe = extra.filter(F.col("conv_id") == "c1").select("rid").first()["rid"]
    got = sink.read(where=[("rid", "=", probe)])
    want = _oracle(
        df.unionByName(extra.filter(F.col("conv_id") == "c1")),
        F.col("rid") == probe,
    )
    assert sorted(
        map(tuple, got.select(
            "conv_id", "turn_idx", "role", "text", "rid", "ts"
        ).collect())
    ) == want

    # compaction replaces chains: replaced paths' blooms are dropped
    # by the central _commit sanitation (bounded manifest growth)
    sink.compact(drop_tombstones=False)
    m2 = sink.current_manifest()
    live = {p for b in m2["buckets"] for p in sink._paths_of(m2, b)}
    assert set(m2.get("blooms", {})) <= live
    # re-analyze blooms the fresh elements, idempotent second run
    sink.analyze_blooms()
    assert sink.analyze_blooms() == {"skipped": True, "reason": "up-to-date"}


def test_bloom_all_null_column_is_maximally_refuting(spark, tmp_path):
    sink = ParquetSnapshotSink(
        spark,
        str(tmp_path / "nulls"),
        num_buckets=2,
        keys=["conv_id", "turn_idx"],
        order_cols=["ts", "seq"],
        mode="mor",
        stats_cols=["rid"],
    )
    df = _rows(spark, 40)
    sink.apply(df.withColumn("rid", F.lit(None).cast("string")), "b0")
    sink.analyze_blooms()
    where = [("rid", "=", "anything")]
    assert _skipped_buckets(sink, where) == set(
        sink.current_manifest()["buckets"]
    ), "an all-NULL element cannot satisfy '=': empty bloom refutes"
    assert sink.read(where=where).count() == 0
