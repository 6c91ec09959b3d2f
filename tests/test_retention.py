"""Retention as logical deletes (sinks/snapshot.retention_delete):
keys whose LWW winner predates the cutoff get a synthesized delete
tombstone applied as one normal batch — visible in the change feed,
idempotent on the derived batch_id, and ordered so late redeliveries
older than the cutoff stay dead while genuinely newer events resurrect
the key. Contrast purge (physical erasure, history destroyed)."""

from pyspark.sql import functions as F

from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
from embulk_util_json_spark.streaming.runner import apply_events_batch


def _ev(seq, op, conv, turn, day, text=None, hms="00:00:00"):
    return (
        seq,
        f'{{"op":"{op}","ts":"2026-01-{day:02d} {hms}.000000",'
        f'"data":{{"conv_id":"{conv}","turn_idx":{turn},"role":"r",'
        f'"text":"{text or f"t{seq}"}","tool":"x"}}}}',
    )


def _mk(spark, rows):
    return spark.createDataFrame(rows, "seq long, event_json string")


def _state(df):
    return sorted((r.conv_id, r.turn_idx, r.text) for r in df.collect())


CUTOFF = "2026-01-10 00:00:00"


def test_retention_basic_and_boundary(spark, tmp_path):
    """Winners strictly before the cutoff die; a winner exactly AT the
    cutoff instant survives (tombstone seq -1 loses the tie)."""
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=2, mode="mor")
    apply_events_batch(
        _mk(spark, [
            _ev(0, "insert", "old", 1, 3),
            _ev(1, "insert", "edge", 1, 10),   # ts == cutoff
            _ev(2, "insert", "new", 1, 15),
        ]),
        sink, "b0",
    )
    m = sink.retention_delete(CUTOFF)
    assert not m.get("skipped")
    assert _state(sink.read()) == [("edge", 1, "t1"), ("new", 1, "t2")]


def test_retention_feed_idempotence_and_late_data(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), num_buckets=2, mode="mor")
    apply_events_batch(
        _mk(spark, [_ev(0, "insert", "old", 1, 3), _ev(1, "insert", "new", 1, 15)]),
        sink, "b0",
    )
    v_pre = sink.current_version()
    sink.retention_delete(CUTOFF)
    # feed shows the tombstone as a net delete
    feed = sink.read_changes(v_pre)
    dels = {(r.conv_id, r.turn_idx) for r in feed.filter(F.col("op") == "delete").collect()}
    assert dels == {("old", 1)}
    # same-cutoff rerun is a committed-batch skip
    assert sink.retention_delete(CUTOFF).get("skipped")
    # late redelivery older than the cutoff stays dead...
    apply_events_batch(_mk(spark, [_ev(5, "update", "old", 1, 5, text="zombie")]), sink, "b1")
    assert _state(sink.read()) == [("new", 1, "t1")]
    # ...but a genuinely newer event resurrects the key
    apply_events_batch(_mk(spark, [_ev(6, "insert", "old", 1, 20, text="back")]), sink, "b2")
    assert _state(sink.read()) == [("new", 1, "t1"), ("old", 1, "back")]


def test_retention_patch_mode(spark, tmp_path):
    """Patch-mode tables: the tombstone kills the whole key including
    carry-forward columns."""
    sink = ParquetSnapshotSink(
        spark, str(tmp_path / "p"), num_buckets=1, mode="mor",
        patch_cols=["role", "text", "tool"],
    )

    def _patch(seq, conv, day, **cols):
        body = ",".join(f'"{k}":"{v}"' for k, v in cols.items())
        return (
            seq,
            f'{{"op":"update","ts":"2026-01-{day:02d} 00:00:00.000000",'
            f'"data":{{"conv_id":"{conv}","turn_idx":1,{body}}}}}',
        )

    apply_events_batch(_mk(spark, [_patch(0, "old", 2, role="r1")]), sink, "b0")
    apply_events_batch(_mk(spark, [_patch(1, "old", 4, text="body")]), sink, "b1")
    apply_events_batch(_mk(spark, [_patch(2, "new", 15, role="r9")]), sink, "b2")
    sink.retention_delete(CUTOFF)
    rows = sink.read().collect()
    assert [(r.conv_id, r.role) for r in rows] == [("new", "r9")]
