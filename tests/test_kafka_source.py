"""Kafka-transport-shaped source adapter (``sources/kafka.py``).

Contract under test: the spark-sql-kafka record shape (key/value/
topic/partition/offset/timestamp) normalizes to canonical change rows
— total LWW tie-break derived from per-partition order
(offset*P+partition, injective and per-partition monotone),
Debezium-convention NULL-value compaction tombstones dropped by
default, upsert-topic mode materializing them as deletes keyed by the
record key at broker-timestamp (ms) time, and the payload parse
delegated to any sibling envelope parser.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from embulk_util_json_spark.sources.events import parse_change_events
from embulk_util_json_spark.sources.kafka import (
    kafka_total_seq,
    parse_kafka_events,
    to_kafka_frame,
)

NATIVE_EVENTS = [
    (10, '{"op":"insert","ts":"2024-03-01 10:00:00.000123",'
         '"data":{"conv_id":"c1","turn_idx":0,"role":"user","text":"t0","tool":null}}'),
    (11, '{"op":"update","ts":"2024-03-01 10:00:00.999999",'
         '"data":{"conv_id":"c1","turn_idx":0,"role":"user","text":"t0v2","tool":null}}'),
    (12, '{"op":"delete","ts":"2024-03-01 10:00:01.500000",'
         '"data":{"conv_id":"c2","turn_idx":3,"role":"user","text":"x","tool":null}}'),
    (13, '{"op":"insert","ts":"2024-03-01 10:00:02",'
         '"data":{"conv_id":"c3","turn_idx":0,"role":"user","text":"x0","tool":"s"}}'),
]


def _native(spark):
    return spark.createDataFrame(NATIVE_EVENTS, "seq long, event_json string")


def test_roundtrip_preserves_order_and_values(spark):
    """Transport round trip: values µs-lossless (the envelope carries
    the event time, not the broker clock), derived seq strictly
    order-isomorphic to the source seq even with compaction markers
    interleaved and a key's events scattered across partitions."""
    native = _native(spark)
    frame = to_kafka_frame(native, n_partitions=4, compaction_tombstones=True)
    got = parse_kafka_events(frame, n_partitions=4).orderBy("seq").collect()
    want = parse_change_events(native).orderBy("seq").collect()
    assert [r.seq for r in got] == [s * 2 for s in (10, 11, 12, 13)]
    for g, w in zip(got, want):
        assert (g.op, g.ts, g.conv_id, g.turn_idx, g.role, g.text, g.tool) == (
            w.op, w.ts, w.conv_id, w.turn_idx, w.role, w.text, w.tool,
        )


def test_compaction_tombstones_dropped_by_default(spark):
    frame = to_kafka_frame(_native(spark), n_partitions=4, compaction_tombstones=True)
    assert frame.filter(F.col("value").isNull()).count() == 1  # one delete
    rows = parse_kafka_events(frame, n_partitions=4)
    assert rows.count() == 4  # marker contributed nothing


def test_upsert_topic_tombstone_is_the_delete(spark):
    """NULL value + key → op='delete' from the record key, stamped at
    the ms broker timestamp; schema matches the envelope parse
    exactly."""
    native = _native(spark)
    full = to_kafka_frame(native, n_partitions=4, compaction_tombstones=True)
    frame = full.filter(
        F.col("value").isNull()
        | ~F.col("value").cast("string").contains('"op":"delete"')
    )
    rows = parse_kafka_events(frame, n_partitions=4, tombstones="delete")
    (d,) = rows.filter(F.col("op") == "delete").collect()
    assert (d.conv_id, d.turn_idx) == ("c2", 3)
    assert d.ts.microsecond == 500000  # ms-truncated broker time
    assert d.role is None and d.text is None
    assert rows.count() == 4


def test_total_seq_is_injective_and_partition_monotone(spark):
    df = spark.createDataFrame(
        [(p, o) for p in range(3) for o in range(5)], "partition int, offset long"
    )
    seqs = [r.s for r in df.select(kafka_total_seq(3).alias("s")).collect()]
    assert len(set(seqs)) == 15
    per_part = (
        df.select("partition", "offset", kafka_total_seq(3).alias("s"))
        .orderBy("partition", "offset")
        .collect()
    )
    for a, b in zip(per_part, per_part[1:]):
        if a.partition == b.partition:
            assert a.s < b.s


def test_n_partitions_inferred_and_bad_mode_rejected(spark):
    frame = to_kafka_frame(_native(spark), n_partitions=4)
    rows = parse_kafka_events(frame)  # derives P from max(partition)+1
    assert rows.count() == 4
    try:
        parse_kafka_events(frame, n_partitions=4, tombstones="purge")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "tombstones" in str(e)
