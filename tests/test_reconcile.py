"""Checksum reconciliation (pipeline/reconcile.py + sink.restore_buckets):
out-of-band damage is detected bucket-exactly, repaired by rewriting
ONLY the damaged buckets from the authoritative reduction, and a clean
table audits clean with no new version."""

import os
import shutil

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from embulk_util_json_spark.operators.lww import lww_agg
from embulk_util_json_spark.pipeline.reconcile import verify_and_repair
from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
from embulk_util_json_spark.sources.events import parse_change_events
from embulk_util_json_spark.sources.generator import generate_events
from embulk_util_json_spark.streaming.runner import apply_events_batch

N = 3000


@pytest.fixture(scope="module")
def ev_parquet(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("reconcile") / "events.parquet")
    pq.write_table(generate_events(N, n_convs=30, n_turns=20), path)
    return path


def _build(spark, ev, root, num_buckets=4):
    sink = ParquetSnapshotSink(spark, root, num_buckets=num_buckets)
    apply_events_batch(ev.filter(F.col("seq") < N // 2), sink, "b1")
    apply_events_batch(ev.filter(F.col("seq") >= N // 2), sink, "b2")
    sink.compact(drop_tombstones=False)
    return sink


def _truth(ev):
    return lww_agg(
        parse_change_events(ev), ["conv_id", "turn_idx"], ["ts", "seq"]
    )


def _state(sink):
    return sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts)
        for r in sink.read().collect()
    )


def _damage(spark, sink, bucket, drop_mod=5):
    man = sink.current_manifest()
    path = os.path.join(sink.root, man["buckets"][bucket][0])
    dmg = (
        spark.read.parquet(path)
        .localCheckpoint()
        .filter(F.col("seq") % drop_mod != 0)
        .withColumn("text", F.reverse("text"))
    )
    tmp = path + ".dmg"
    dmg.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)


def test_clean_table_audits_clean(spark, ev_parquet, tmp_path):
    ev = spark.read.parquet(ev_parquet)
    sink = _build(spark, ev, str(tmp_path / "t"))
    v0 = sink.current_version()
    rep = verify_and_repair(sink, _truth(ev))
    assert rep["mismatched"] == [] and rep["repaired"] == []
    assert rep["version"] == v0  # no spurious commit
    assert rep["buckets_checked"] > 0


def test_damage_detected_and_healed(spark, ev_parquet, tmp_path):
    ev = spark.read.parquet(ev_parquet)
    sink = _build(spark, ev, str(tmp_path / "t"))
    clean = _state(sink)
    victims = sorted(sink.current_manifest()["buckets"], key=int)[:2]
    for b in victims:
        _damage(spark, sink, b)
    assert _state(sink) != clean  # damage is visible before repair

    before = sink.current_manifest()
    rep = verify_and_repair(sink, _truth(ev))
    assert rep["mismatched"] == [int(b) for b in victims]
    assert rep["repaired"] == rep["mismatched"]
    assert _state(sink) == clean  # healed bit-equal

    # untouched buckets keep their chain paths verbatim (never rewritten)
    after = sink.current_manifest()
    for b in after["buckets"]:
        if b not in victims:
            assert after["buckets"][b] == before["buckets"][b]


def test_detect_only_leaves_table_unchanged(spark, ev_parquet, tmp_path):
    ev = spark.read.parquet(ev_parquet)
    sink = _build(spark, ev, str(tmp_path / "t"))
    victim = sorted(sink.current_manifest()["buckets"], key=int)[0]
    _damage(spark, sink, victim)
    v0 = sink.current_version()
    damaged = _state(sink)
    rep = verify_and_repair(sink, _truth(ev), repair=False)
    assert rep["mismatched"] == [int(victim)] and rep["repaired"] == []
    assert sink.current_version() == v0
    assert _state(sink) == damaged


def test_restore_rejects_patch_mode(spark, ev_parquet, tmp_path):
    ev = spark.read.parquet(ev_parquet)
    sink = ParquetSnapshotSink(
        spark,
        str(tmp_path / "t"),
        num_buckets=4,
        patch_cols=["text", "tool"],
    )
    apply_events_batch(ev, sink, "b1")
    with pytest.raises(ValueError, match="row-level"):
        sink.restore_buckets(_truth(ev), [0])
