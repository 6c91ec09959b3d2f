"""Auto-split from __spark_entry__.py (round 5): stream-side CDC queries: wire formats, ordering/fencing, txn atomicity, patch-mode merge, schema evolution

Part of the driver registry package — every ``_q_*`` callable is a
``(spark, sf_dir) -> DataFrame`` query and every ``_ORACLE_*`` /
``*_oracle`` value is its DuckDB ANSI-SQL twin. See
``__spark_entry__.queries()`` for the graded registry order.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from .common import *  # noqa: F401,F403 — shared fixtures/oracle fragments


def _wire_format_final_state(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    """Shared body for the wire-format adapter queries: re-wrap the
    derived native change stream into a connector wire format
    (Debezium / Maxwell), parse it back through the adapter, and
    replay to the final transcripts state. Proves the round-trip
    invariant adapter ∘ rewrap ≡ native parse end-to-end — the same
    LWW/tombstone plan as ``cdc_apply_final_state``, so any divergence
    is the adapter's."""
    from embulk_util_json_spark.operators.lww import lww_agg
    from embulk_util_json_spark.sources import debezium as dbz

    events = _events_as_cdc_json(spark, sf_dir)
    if fmt == "debezium":
        changes = dbz.parse_debezium_events(dbz.to_debezium_json(events))
    elif fmt == "canal":
        from embulk_util_json_spark.sources import canal

        changes = canal.parse_canal_events(canal.to_canal_json(events))
    elif fmt == "wal2json":
        from embulk_util_json_spark.sources import wal2json as w2j

        changes = w2j.parse_wal2json_events(w2j.to_wal2json_json(events))
    elif fmt == "mongo":
        from embulk_util_json_spark.sources import mongo

        changes = mongo.parse_mongo_changestream(
            mongo.to_mongo_changestream_json(events)
        )
    else:
        changes = dbz.parse_maxwell_events(dbz.to_maxwell_json(events))
    final = lww_agg(changes, ["conv_id", "turn_idx"], ["ts", "seq"])
    return final.filter(F.col("op") != "delete").select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


def _q_cdc_debezium_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium-envelope ingest (op c/u/d/r, before/after row images,
    source.ts_us event time): wire-format adapter → LWW replay.
    Microsecond-lossless, so the oracle is the native CDC oracle."""
    return _wire_format_final_state(spark, sf_dir, "debezium")


def _q_cdc_maxwell_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maxwell-envelope ingest (type insert/update/delete, full row in
    ``data``, epoch-second ``ts``): wire-format adapter → LWW replay.
    The wire format is second-granular, so the oracle truncates ts to
    seconds and lets ties fall to seq — same rule the engine applies."""
    return _wire_format_final_state(spark, sf_dir, "maxwell")


def _q_cdc_canal_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canal flat-message ingest (row-BATCHED envelopes: one envelope
    per run of consecutive same-op/same-ms events, 1→N posexplode in
    the adapter, derived per-row seq preserving delivery order):
    wire-format adapter → LWW replay. Canal's ``es`` is epoch millis,
    so the oracle truncates ts to milliseconds — the wire format's
    honest precision — and lets ties fall to seq."""
    return _wire_format_final_state(spark, sf_dir, "canal")


def _q_cdc_wal2json_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """wal2json v2 ingest (PostgreSQL logical decoding: action I/U/D,
    ``columns`` array-of-{name,type,value} row images pivoted to the
    canonical map in codegen, deletes via REPLICA IDENTITY ``identity``,
    per-action commit timestamp with a zone offset normalized to UTC
    arithmetically): wire-format adapter → LWW replay. Microsecond-
    lossless, so the oracle is the native CDC oracle."""
    return _wire_format_final_state(spark, sf_dir, "wal2json")


def _q_cdc_mongo_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MongoDB change-stream ingest (operationType insert/update/
    replace/delete, relaxed-extended-JSON envelopes, post-image
    ``fullDocument`` row images, documentKey-only deletes,
    collection-lifecycle control events filtered): wire-format adapter
    → LWW replay. ``wallTime`` is a BSON datetime — millisecond
    precision — so the oracle truncates ts to ms and lets ties fall to
    seq, the same rule as Canal."""
    return _wire_format_final_state(spark, sf_dir, "mongo")


def _mongo_patchify(changes: DataFrame) -> DataFrame:
    """The ``_patchify`` marker pattern extended with Mongo $unset
    semantics (mirrored by ``_ORACLE_MONGO_PATCH_CASES``): on updates,
    ``role`` is REMOVED (explicit NULL → ``removedFields``) every 5th
    seq ≡ 1, else marked unchanged on even seq; ``text`` unchanged on
    seq % 3; ``tool`` never restated. Single-sourced pattern so engine
    and oracle cannot drift."""
    is_upd = F.col("op") == "update"
    m = F.lit(_PATCH_MARKER)
    return changes.select(
        "seq", "op", "ts", "conv_id", "turn_idx",
        F.when(is_upd & (F.col("seq") % 5 == 1), F.lit(None).cast("string"))
        .when(is_upd & (F.col("seq") % 2 == 0), m)
        .otherwise(F.col("role")).alias("role"),
        F.when(is_upd & (F.col("seq") % 3 == 0), m).otherwise(F.col("text")).alias("text"),
        F.when(is_upd, m).otherwise(F.col("tool")).alias("tool"),
    )


def _q_cdc_mongo_patch_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo ``updateDescription`` → column-level LWW SINK replay: the
    sparse-update reading of the change stream. Updates are rewrapped
    WITHOUT post-images — ``updatedFields`` carries only the touched
    columns and ``removedFields`` the $unset ones — parsed back by
    ``parse_mongo_patch_events`` (touched → present write, $unset →
    explicit NULL, untouched → unchanged marker), and applied in three
    interleaved micro-batches through a merge-on-read
    ``ParquetSnapshotSink(patch_cols=...)``, compacted, then read.
    Must equal the one-shot full-history column-level-LWW oracle at
    the wire format's ms precision — the Mongo-native proof of the
    patch monoid: a $unset is an explicit NULL write that carries
    forward, an untouched column resolves to its last real writer."""
    from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
    from embulk_util_json_spark.sources import mongo
    from embulk_util_json_spark.sources.events import parse_change_events

    changes = parse_change_events(_events_as_cdc_json(spark, sf_dir))
    patched = _mongo_patchify(changes)
    wire = mongo.rows_to_mongo_patch_json(patched, _PATCH_MARKER)
    # pin the double-JSON fixture pipeline (concat → parse → rewrap →
    # parse) once: the 3 applies + compact would otherwise recompute
    # it per job. In production the wire feed is read once from the
    # log — this checkpoint stands in for that read.
    back = (
        mongo.parse_mongo_patch_events(wire, _PATCH_MARKER)
        .drop("_extras")
        .localCheckpoint()
    )
    work = _scratch("mongo_patch_")
    sink = ParquetSnapshotSink(
        spark, os.path.join(work, "t"), num_buckets=8, mode="mor",
        patch_cols=["role", "text", "tool"], unchanged_marker=_PATCH_MARKER,
    )
    for i in range(3):
        sink.apply(back.filter(F.col("seq") % 3 == i), f"b{i}")
    sink.compact(drop_tombstones=False)
    return sink.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")


_ORACLE_MONGO_PATCH_CASES = f"""CASE WHEN op = 'update' AND seq % 5 = 1
                 THEN NULL
                 WHEN op = 'update' AND seq % 2 = 0
                 THEN '{_PATCH_MARKER}' ELSE role END AS role,
            CASE WHEN op = 'update' AND seq % 3 = 0
                 THEN '{_PATCH_MARKER}' ELSE text END AS text,
            CASE WHEN op = 'update'
                 THEN '{_PATCH_MARKER}' ELSE tool END AS tool"""


_ORACLE_MONGO_PATCH_FINAL = f"""
    WITH changes AS (
        SELECT seq, op, date_trunc('milliseconds', ts) AS ts,
               conv_id, turn_idx, role, text, tool
        FROM ({_ORACLE_CDC_EVENTS})
    ),
    patched AS (
        SELECT seq, op, ts, conv_id, turn_idx,
            {_ORACLE_MONGO_PATCH_CASES}
        FROM changes
    ),
    resolved AS (
        SELECT conv_id, turn_idx,
            (last_value(CASE WHEN role IS DISTINCT FROM '{_PATCH_MARKER}'
                 AND op <> 'delete'
                 THEN {{'v': role}} END IGNORE NULLS) OVER w).v AS role,
            (last_value(CASE WHEN text IS DISTINCT FROM '{_PATCH_MARKER}'
                 AND op <> 'delete'
                 THEN {{'v': text}} END IGNORE NULLS) OVER w).v AS text,
            (last_value(CASE WHEN tool IS DISTINCT FROM '{_PATCH_MARKER}'
                 AND op <> 'delete'
                 THEN {{'v': tool}} END IGNORE NULLS) OVER w).v AS tool,
            last_value(op) OVER w AS op,
            last_value(ts) OVER w AS ts,
            ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC
            ) AS rn
        FROM patched
        WINDOW w AS (
            PARTITION BY conv_id, turn_idx ORDER BY ts, seq
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    )
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM resolved WHERE rn = 1 AND op <> 'delete'
"""


def _q_cdc_kafka_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-TRANSPORT ingest (``sources/kafka.py``): the native
    envelopes ride a synthesized Kafka-source-shaped frame (key/value/
    topic/partition/offset/timestamp — the spark-sql-kafka contract)
    across 4 partitions with the ADVERSARIAL placement (a key's events
    scattered over partitions), plus Debezium-convention NULL-value
    compaction tombstones after every delete. The adapter derives the
    total LWW tie-break ``offset*P+partition`` from per-partition
    order, drops the compaction markers, and delegates the payload
    parse to the native envelope parser — µs-lossless, so the plain
    CDC oracle applies."""
    from embulk_util_json_spark.operators.lww import lww_agg
    from embulk_util_json_spark.sources.kafka import (
        parse_kafka_events,
        to_kafka_frame,
    )

    events = _events_as_cdc_json(spark, sf_dir)
    frame = to_kafka_frame(events, n_partitions=4, compaction_tombstones=True)
    changes = parse_kafka_events(frame, n_partitions=4)
    final = lww_agg(changes, ["conv_id", "turn_idx"], ["ts", "seq"])
    return final.filter(F.col("op") != "delete").select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


def _q_cdc_kafka_upsert_topic_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka UPSERT-TOPIC ingest (ksqlDB TABLE semantics): deletes
    arrive ONLY as NULL-value tombstones — no delete envelope at all —
    keyed by the table key, stamped with the broker timestamp (ms).
    ``tombstones="delete"`` materializes them as delete rows; upserts
    keep their µs envelope time. The oracle mirrors the mixed
    precision exactly: delete events ms-truncated, everything else
    untouched, ties to seq."""
    from embulk_util_json_spark.operators.lww import lww_agg
    from embulk_util_json_spark.sources.kafka import (
        parse_kafka_events,
        to_kafka_frame,
    )

    events = _events_as_cdc_json(spark, sf_dir)
    full = to_kafka_frame(events, n_partitions=4, compaction_tombstones=True)
    # upsert topic: strip the delete ENVELOPES, keep their NULL-value
    # tombstones (to_kafka_frame emits envelope + marker; dropping the
    # envelope leaves exactly the ksqlDB upsert-topic shape)
    frame = full.filter(
        F.col("value").isNull()
        | ~F.col("value").cast("string").contains('"op":"delete"')
    )
    changes = parse_kafka_events(frame, n_partitions=4, tombstones="delete")
    final = lww_agg(changes, ["conv_id", "turn_idx"], ["ts", "seq"])
    return final.filter(F.col("op") != "delete").select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


_ORACLE_KAFKA_UPSERT = f"""
    WITH changes AS (
        SELECT seq, op,
               CASE WHEN op = 'delete'
                    THEN date_trunc('milliseconds', ts) ELSE ts END AS ts,
               conv_id, turn_idx, role, text, tool
        FROM ({_ORACLE_CDC_EVENTS})
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC
        ) AS rn
        FROM changes
    )
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM ranked WHERE rn = 1 AND op <> 'delete'
"""



def _q_cdc_config_ingest_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative CONFIG-DRIVEN ingest (``ingest.run_ingest`` — the
    Embulk-config analogue): one plain-dict config wires a
    parquet-binlog source, the Debezium wire dialect, the MOR merge,
    and the exactly-once sink; the facade replays the feed in three
    seq-contiguous micro-batches through the SAME apply path every
    other entry point uses, so the result must equal the native CDC
    oracle bit-for-bit (Debezium is µs-lossless). This is the
    "a user of the reference switches their Embulk YAML to this
    engine" proof: source × dialect × merge × sink chosen by config,
    zero code."""
    from embulk_util_json_spark.ingest import run_ingest
    from embulk_util_json_spark.sources import debezium as dbz

    work = _scratch("cfg_ingest_")
    events = _events_as_cdc_json(spark, sf_dir)
    binlog = os.path.join(work, "binlog")
    dbz.to_debezium_json(events).write.parquet(binlog)
    res = run_ingest(
        spark,
        {
            "in": {"type": "binlog_parquet", "path": binlog,
                   "format": "debezium"},
            "merge": {"mode": "mor", "num_buckets": 8},
            "out": {"root": os.path.join(work, "t")},
            "run": {"num_batches": 3},
        },
    )
    assert len(res["batches"]) == 3
    assert all(not b.get("skipped") for b in res["batches"]), res["batches"]
    return res["sink"].read().select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )



def _q_cdc_config_stream_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config-driven STREAMING ingest (``ingest.run_ingest_stream`` —
    the north rule's operating mode from the declarative surface): the
    derived change stream is written as four seq-sliced parquet WAL
    segments, a config wires the streaming tail (1 file per trigger →
    4 real micro-batch epochs) into the exactly-once sink, the query
    drains and stops. Final state must equal the native CDC oracle —
    and a SECOND start on the same checkpoint is runtime-asserted to
    replay nothing (version unchanged): the resumability contract."""
    from embulk_util_json_spark.ingest import run_ingest_stream

    work = _scratch("cfg_stream_")
    events = _events_as_cdc_json(spark, sf_dir)
    src_dir = os.path.join(work, "wal")
    events.withColumn("_g", F.col("seq") % 4).repartition(4, "_g").drop(
        "_g"
    ).write.parquet(src_dir)
    cfg = {
        "in": {"type": "parquet_stream", "path": src_dir},
        "merge": {"mode": "mor", "num_buckets": 8},
        "out": {"root": os.path.join(work, "t")},
        "run": {"checkpoint_dir": os.path.join(work, "ckpt"),
                "max_files_per_trigger": 1},
    }
    res = run_ingest_stream(spark, cfg)
    res["query"].processAllAvailable()
    res["query"].stop()
    v = res["sink"].current_version()
    assert v >= 1
    res2 = run_ingest_stream(spark, cfg)
    res2["query"].processAllAvailable()
    res2["query"].stop()
    assert res2["sink"].current_version() == v, "checkpoint restart replayed data"
    return res2["sink"].read().select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


def _q_cdc_wal2json_txn_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-transaction atomicity from REAL wal2json framing: the
    stream is rewrapped with B/C transaction actions (include-xids
    semantics, 64-event transactions), split into row/marker feeds by
    ``parse_wal2json_txn_stream``, and applied through
    ``TxnBoundaryApplier`` in two batches whose boundary cuts INSIDE
    a transaction — the cut transaction's head is runtime-asserted
    HELD (invisible) until its C arrives in batch 2. Fully drained,
    the final state equals the plain LWW fold, so the native CDC
    oracle applies."""
    from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
    from embulk_util_json_spark.sources.wal2json import (
        parse_wal2json_events,
        parse_wal2json_txn_stream,
        to_wal2json_txn_json,
    )
    from embulk_util_json_spark.streaming.txn_boundary import TxnBoundaryApplier

    work = _scratch("w2jtxn_")
    events = _events_as_cdc_json(spark, sf_dir)
    # pin the framed-wire fixture once (concat → parse → B/C framing
    # is a multi-branch JSON build recomputed by every downstream job
    # otherwise; in production this is one log read)
    wire = to_wal2json_txn_json(events, txn_size=64).localCheckpoint()
    rows, markers = parse_wal2json_txn_stream(wire)
    b = events.agg(F.min("seq").alias("lo"), F.max("seq").alias("hi")).collect()[0]
    # wire seqs are source*3+{0,1,2}; cut mid-transaction: halfway
    # through the txn containing the source midpoint, NOT on a 64-edge
    mid = (int(b.lo) + int(b.hi)) // 2
    cut_src = (mid // 64) * 64 + 32
    cut_txid = cut_src // 64
    sink = ParquetSnapshotSink(spark, os.path.join(work, "t"), num_buckets=8)
    ap = TxnBoundaryApplier(
        spark, sink, os.path.join(work, "txn"), parse_fn=parse_wal2json_events
    )
    r1 = ap.apply(
        rows.filter(F.col("seq") < cut_src * 3),
        markers.filter(F.col("txid") < cut_txid),
    )
    assert r1["held_batch"] and r1["open_rows"] > 0, r1
    r2 = ap.apply(
        rows.filter(F.col("seq") >= cut_src * 3),
        markers.filter(F.col("txid") >= cut_txid),
    )
    assert r2["open_rows"] == 0, r2
    return sink.read().select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


_ORACLE_CDC_FINAL_MS = f"""
    WITH changes AS (
        SELECT seq, op, date_trunc('milliseconds', ts) AS ts,
               conv_id, turn_idx, role, text, tool
        FROM ({_ORACLE_CDC_EVENTS})
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC
        ) AS rn
        FROM changes
    )
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


_ORACLE_CDC_FINAL_SEC = f"""
    WITH changes AS (
        SELECT seq, op, date_trunc('second', ts) AS ts,
               conv_id, turn_idx, role, text, tool
        FROM ({_ORACLE_CDC_EVENTS})
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC
        ) AS rn
        FROM changes
    )
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def _q_cdc_seq_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binlog continuity: every maximal missing seq range of the holey
    stream (distributed range-parallel LAG + driver boundary stitch —
    never a single-task global window)."""
    from embulk_util_json_spark.pipeline.disorder import seq_gaps

    return seq_gaps(_holey_events(spark, sf_dir), "seq")


def _q_cdc_seq_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row continuity summary of the holey stream with duplicate
    deliveries injected (every 997th surviving seq delivered twice):
    span, distinct/dup counts, gap count, missing positions."""
    from embulk_util_json_spark.pipeline.disorder import seq_continuity_summary

    holey = _holey_events(spark, sf_dir)
    withdups = holey.unionByName(holey.filter(F.col("seq") % 997 == 0))
    return seq_continuity_summary(withdups, "seq")


def _q_cdc_dlq_repair_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DLQ repair & replay, end to end: a deterministically corrupted
    change stream (every 97th event's envelope prefixed with junk)
    replays with a dead-letter dir, then ``replay_quarantine`` with a
    prefix-stripping fixer drains the queue back into the sink —
    final table state must equal the clean replay (the plain CDC
    oracle), proving the repair loop loses and duplicates nothing."""
    from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
    from embulk_util_json_spark.streaming.runner import (
        apply_events_batch,
        replay_quarantine,
    )

    work = _scratch("dlq_")
    events = _events_as_cdc_json(spark, sf_dir)
    corrupt = events.withColumn(
        "event_json",
        F.when(
            F.col("seq") % 97 == 0,
            F.concat(F.lit("CORRUPT "), F.col("event_json")),
        ).otherwise(F.col("event_json")),
    )
    sink = ParquetSnapshotSink(spark, os.path.join(work, "t"), num_buckets=8)
    qdir = os.path.join(work, "dead")
    apply_events_batch(corrupt, sink, "b0", quarantine_dir=qdir)

    def fix(raw: DataFrame) -> DataFrame:
        return raw.withColumn(
            "event_json", F.regexp_replace("event_json", "^CORRUPT ", "")
        )

    replay_quarantine(spark, qdir, sink, repair_fn=fix)
    return sink.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def _seq_gaps_oracle() -> str:
    from embulk_util_json_spark.pipeline.disorder import seq_gaps_sql

    return seq_gaps_sql(_HOLEY_SQL, "seq")


def _seq_summary_oracle() -> str:
    from embulk_util_json_spark.pipeline.disorder import (
        seq_continuity_summary_sql,
    )

    withdups = (
        f"{_HOLEY_SQL} UNION ALL "
        f"SELECT * FROM ({_HOLEY_SQL}) WHERE seq % 997 = 0"
    )
    return seq_continuity_summary_sql(withdups, "seq")


def _q_cdc_gap_fenced_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-order commit fencing ∘ LWW apply: a stream missing a
    50-position WAL chunk at its midpoint is applied only up to the
    first hole — the sink never reflects a suffix of the log while
    missing part of its prefix (the lost event could be the delete
    between two updates). The fence derives from the range-parallel
    gap detector and is broadcast as one row; held-back events are
    filtered BEFORE the merge exchange."""
    from embulk_util_json_spark.operators.lww import lww_agg
    from embulk_util_json_spark.pipeline.disorder import fence_at_first_gap
    from embulk_util_json_spark.sources.events import parse_change_events

    fenced = fence_at_first_gap(_gapped_midpoint_events(spark, sf_dir), "seq")
    changes = parse_change_events(fenced)
    return (
        lww_agg(changes, ["conv_id", "turn_idx"], ["ts", "seq"])
        .filter(F.col("op") != "delete")
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )


_ORACLE_GAP_FENCED = f"""
    WITH ev AS ({_ORACLE_CDC_EVENTS}),
    mid AS (SELECT MAX(seq) // 2 AS m FROM ev),
    gapped AS (
        SELECT ev.* FROM ev, mid
        WHERE NOT (seq >= m AND seq < m + 50)
    ),
    l AS (
        SELECT seq, LAG(seq) OVER (ORDER BY seq) AS prev
        FROM (SELECT DISTINCT seq FROM gapped)
    ),
    fence AS (
        SELECT COALESCE(MIN(prev + 1), 9223372036854775807) AS f
        FROM l WHERE seq > prev + 1
    ),
    visible AS (SELECT g.* FROM gapped g, fence WHERE g.seq < f),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC
        ) AS rn FROM visible
    )
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def _q_cdc_fenced_replay_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful in-order fencing end to end: batch A arrives missing a
    50-position WAL chunk at the midpoint — the FencedApplier commits
    only the contiguous prefix and durably holds the suffix; batch B
    refetches the hole (plus the tail) — the pending store drains and
    the frontier advances. Final table state must equal the plain LWW
    apply of the WHOLE stream (the standard CDC oracle): the fence
    delayed visibility but lost and duplicated nothing."""
    from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
    from embulk_util_json_spark.streaming.fenced import FencedApplier

    work = _scratch("fenced_")
    ev = _events_as_cdc_json(spark, sf_dir)
    mid = ev.agg(F.expr("max(seq) div 2").alias("_mid"))
    cut = ev.agg(F.expr("(max(seq) * 2) div 3").alias("_cut"))
    e = ev.crossJoin(F.broadcast(mid)).crossJoin(F.broadcast(cut))
    in_hole = (F.col("seq") >= F.col("_mid")) & (F.col("seq") < F.col("_mid") + 50)
    batch_a = e.filter((F.col("seq") < F.col("_cut")) & ~in_hole).drop("_mid", "_cut")
    batch_b = e.filter((F.col("seq") >= F.col("_cut")) | in_hole).drop("_mid", "_cut")

    sink = ParquetSnapshotSink(spark, os.path.join(work, "t"), num_buckets=8)
    fa = FencedApplier(spark, sink, os.path.join(work, "fence"))
    r1 = fa.apply(batch_a)
    assert r1["held_batch"], "fixture must actually hold a suffix"
    r2 = fa.apply(batch_b)
    assert r2["pending_rows"] == 0, "refetch must drain the pending store"
    return sink.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def _q_cdc_chunked_bootstrap_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-chunked initial load (the public DBLog / Flink-CDC
    incremental-snapshot shape) over a RETENTION-TRUNCATED tail: the
    replayable log starts at seq > max(seq) div 3, so a third of
    history exists only in the (simulated) source table. Three chunk
    selects bracketed by (lw, hw] watermark pairs interleave with
    tail micro-batches; seeded rows pin at (their own ts, lw) and the
    (ts, seq) LWW monoid resolves every chunk-vs-log race. The final
    table must equal the WHOLE-log LWW oracle — the truncated prefix
    is recovered entirely through the chunk path."""
    from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
    from embulk_util_json_spark.sources.events import parse_change_events
    from embulk_util_json_spark.streaming.chunked import (
        chunked_bootstrap_replay,
        log_state_source,
    )

    work = _scratch("chunked_")
    ev = _events_as_cdc_json(spark, sf_dir)
    hi = ev.agg(F.max("seq").alias("m")).collect()[0].m
    tail = ev.filter(F.col("seq") > int(hi) // 3)
    sink = ParquetSnapshotSink(spark, os.path.join(work, "t"), num_buckets=8)
    src = log_state_source(parse_change_events(ev), n_chunks=3)
    res = chunked_bootstrap_replay(spark, tail, sink, src, n_chunks=3)
    assert res["seeded_rows"] > 0, "fixture must exercise chunk seeding"
    return sink.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def _q_cdc_sharded_fenced_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded-source merge with independent per-shard commit fencing:
    the stream is decomposed into 3 shards with dense per-shard seq
    spaces (shard = seq % 3, shard_seq = seq div 3 — both engines
    derive the identical decomposition), shard 1 loses a 20-position
    WAL chunk at its midpoint, each shard is fenced at ITS OWN first
    hole (shards 0/2 commit fully — no cross-shard stall), and the
    deterministic merge stamp (shard_seq * 3 + shard) reconstructs
    the global LWW order. Oracle: the naive per-shard LAG fence +
    single-window LWW over the same decomposition."""
    from embulk_util_json_spark.operators.lww import lww_agg
    from embulk_util_json_spark.pipeline.shards import (
        fence_per_shard,
        merge_shard_seqs,
    )
    from embulk_util_json_spark.sources.events import parse_change_events

    ev = _events_as_cdc_json(spark, sf_dir)
    sh = ev.select(
        (F.col("seq") % 3).cast("int").alias("shard"),
        F.expr("seq div 3").alias("seq"),
        "event_json",
    )
    mid = sh.filter("shard = 1").agg(F.expr("max(seq) div 2").alias("_mid"))
    gapped = (
        sh.crossJoin(F.broadcast(mid))
        .filter(
            ~(
                (F.col("shard") == 1)
                & (F.col("seq") >= F.col("_mid"))
                & (F.col("seq") < F.col("_mid") + 20)
            )
        )
        .drop("_mid")
    )
    merged = merge_shard_seqs(fence_per_shard(gapped), 3).drop("shard")
    changes = parse_change_events(merged)
    return (
        lww_agg(changes, ["conv_id", "turn_idx"], ["ts", "seq"])
        .filter(F.col("op") != "delete")
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )


_ORACLE_SHARDED_FENCED = f"""
    WITH ev AS ({_ORACLE_CDC_EVENTS}),
    s AS (
        SELECT seq % 3 AS shard, seq // 3 AS sseq,
               op, ts, conv_id, turn_idx, role, text, tool
        FROM ev
    ),
    mid AS (SELECT MAX(sseq) // 2 AS m FROM s WHERE shard = 1),
    gapped AS (
        SELECT s.* FROM s, mid
        WHERE NOT (shard = 1 AND sseq >= m AND sseq < m + 20)
    ),
    l AS (
        SELECT shard, sseq,
               LAG(sseq) OVER (PARTITION BY shard ORDER BY sseq) AS prev
        FROM (SELECT DISTINCT shard, sseq FROM gapped)
    ),
    fence AS (
        SELECT shard,
               COALESCE(MIN(CASE WHEN sseq > prev + 1 THEN prev + 1 END),
                        9223372036854775807) AS f
        FROM l GROUP BY shard
    ),
    merged AS (
        SELECT g.sseq * 3 + g.shard AS seq,
               g.op, g.ts, g.conv_id, g.turn_idx, g.role, g.text, g.tool
        FROM gapped g JOIN fence ON g.shard = fence.shard
        WHERE g.sseq < fence.f
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC
        ) AS rn
        FROM merged
    )
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def _q_cdc_txn_boundary_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-transaction atomicity (``streaming/txn_boundary``): rows
    frame into source transactions (txid = seq div 64); commit/abort
    markers arrive on their own feed and LAG the rows — batch A gets
    rows up to the ⅔ seq cut but markers only up to cut_txid − 3, so
    committed-but-unmarked transactions are durably HELD across the
    batch boundary; batch B delivers the remaining markers and drains
    them. Aborted transactions (txid % 11 = 5) are dropped entirely;
    the last transaction never gets a marker and must stay invisible.
    Final table = LWW over rows of committed transactions only."""
    from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
    from embulk_util_json_spark.streaming.txn_boundary import TxnBoundaryApplier

    work = _scratch("txnb_")
    ev = _events_as_cdc_json(spark, sf_dir).withColumn(
        "txid", F.expr("seq div 64")
    )
    hi = int(ev.agg(F.max("seq").alias("m")).collect()[0].m)
    mx_txid, cut_seq = hi // 64, (hi * 2) // 3
    cut_txid = cut_seq // 64
    markers = (
        ev.select("txid")
        .distinct()
        .filter(F.col("txid") < mx_txid)
        .select(
            "txid",
            F.when(F.col("txid") % 11 == 5, F.lit("abort"))
            .otherwise(F.lit("commit"))
            .alias("status"),
        )
    )
    sink = ParquetSnapshotSink(spark, os.path.join(work, "t"), num_buckets=8)
    ap = TxnBoundaryApplier(spark, sink, os.path.join(work, "txn"))
    r1 = ap.apply(
        ev.filter(F.col("seq") < cut_seq),
        markers.filter(F.col("txid") <= cut_txid - 3),
    )
    assert r1["held_batch"], "fixture must hold committed-but-unmarked txns"
    r2 = ap.apply(
        ev.filter(F.col("seq") >= cut_seq),
        markers.filter(F.col("txid") > cut_txid - 3),
    )
    assert r2["open_rows"] > 0, "the unterminated last txn must stay held"
    return sink.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")


_ORACLE_TXN_BOUNDARY = f"""
    WITH ev AS ({_ORACLE_CDC_EVENTS}),
    t AS (SELECT ev.*, seq // 64 AS txid FROM ev),
    mx AS (SELECT MAX(txid) AS mt FROM t),
    vis AS (
        SELECT t.* FROM t, mx
        WHERE txid < mt AND txid % 11 <> 5
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC
        ) AS rn FROM vis
    )
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def _q_cdc_before_image_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Before-image integrity audit (``operators/integrity``): the
    stream carries row before-images derived from its own history
    (LAG of the after image), then every 13th event's before_text is
    drifted out of band. The detector must flag exactly the drifted
    update/delete events — ``mismatch`` when a predecessor exists,
    ``no_predecessor`` when the creating insert was never captured —
    and stay silent on every clean row. Oracle: the same LAG audit in
    SQL with null-safe column comparison."""
    from pyspark.sql import Window

    from embulk_util_json_spark.operators.integrity import (
        detect_before_image_conflicts,
    )
    from embulk_util_json_spark.sources.events import parse_change_events

    changes = parse_change_events(_events_as_cdc_json(spark, sf_dir))
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("ts", "seq")
    withb = (
        changes.withColumn("before_role", F.lag("role").over(w))
        .withColumn(
            "before_text",
            F.when(F.col("seq") % 13 == 4, F.lit("DRIFT")).otherwise(
                F.lag("text").over(w)
            ),
        )
        .withColumn("before_tool", F.lag("tool").over(w))
    )
    ann = detect_before_image_conflicts(
        withb,
        ["conv_id", "turn_idx"],
        ["ts", "seq"],
        {"role": "before_role", "text": "before_text", "tool": "before_tool"},
    )
    return ann.filter("conflict").select(
        "conv_id", "turn_idx", "seq", "ts", "conflict_reason",
        "before_text", "expected_text",
    )


_ORACLE_BEFORE_IMAGE = f"""
    WITH ev AS ({_ORACLE_CDC_EVENTS}),
    w AS (
        SELECT ev.*,
               LAG(role) OVER win AS p_role,
               LAG(text) OVER win AS p_text,
               LAG(tool) OVER win AS p_tool,
               LAG(seq)  OVER win AS p_seq
        FROM ev
        WINDOW win AS (PARTITION BY conv_id, turn_idx ORDER BY ts, seq)
    ),
    b AS (
        SELECT *,
               p_role AS before_role,
               CASE WHEN seq % 13 = 4 THEN 'DRIFT' ELSE p_text END
                   AS before_text,
               p_tool AS before_tool
        FROM w
    )
    SELECT conv_id, turn_idx, seq, ts,
           CASE WHEN p_seq IS NULL THEN 'no_predecessor'
                ELSE 'mismatch' END AS conflict_reason,
           before_text,
           p_text AS expected_text
    FROM b
    WHERE op IN ('update', 'delete')
      AND (before_role IS NOT NULL OR before_text IS NOT NULL
           OR before_tool IS NOT NULL)
      AND (p_seq IS NULL
           OR NOT (before_role IS NOT DISTINCT FROM p_role
                   AND before_text IS NOT DISTINCT FROM p_text
                   AND before_tool IS NOT DISTINCT FROM p_tool))
"""


def _q_cdc_pk_change_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key-change handling (``operators/keychange``): every
    17th update moves its row to a new key (old_turn_idx =
    (turn_idx + 7) % 25 rides the event, Debezium-newkey style). The
    expansion emits a tombstone at the OLD key plus the change at the
    new key in one inline projection, so the key-equi LWW merge leaves
    no ghost behind at the vacated key. Oracle: the same expansion as
    a UNION ALL over the derived stream."""
    from embulk_util_json_spark.operators.keychange import expand_key_changes
    from embulk_util_json_spark.operators.lww import lww_agg
    from embulk_util_json_spark.sources.events import parse_change_events

    changes = parse_change_events(_events_as_cdc_json(spark, sf_dir))
    movers = (F.col("op") == "update") & (F.col("seq") % 17 == 3)
    with_old = changes.withColumn(
        "old_turn_idx",
        F.when(movers, ((F.col("turn_idx") + 7) % 25).cast("int")),
    )
    expanded = expand_key_changes(with_old, {"turn_idx": "old_turn_idx"})
    return (
        lww_agg(expanded, ["conv_id", "turn_idx"], ["ts", "seq"])
        .filter(F.col("op") != "delete")
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )


_ORACLE_PK_CHANGE = f"""
    WITH ev AS ({_ORACLE_CDC_EVENTS}),
    expanded AS (
        SELECT op, ts, seq, conv_id, turn_idx, role, text, tool FROM ev
        UNION ALL
        SELECT 'delete' AS op, ts, seq, conv_id,
               CAST((turn_idx + 7) % 25 AS INTEGER) AS turn_idx,
               role, text, tool
        FROM ev WHERE op = 'update' AND seq % 17 = 3
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC
        ) AS rn FROM expanded
    )
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def _q_cdc_replication_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replica freshness report: with the applied high-watermark
    pinned at the seq midpoint (integer arithmetic — both engines pin
    the identical cut), report the pending backlog, the distinct keys
    it will touch, and the event-time lag between the replica's and
    the source's frontiers. One conditional hash aggregation, one
    pass, no window."""
    from embulk_util_json_spark.pipeline.disorder import replication_lag_summary

    from embulk_util_json_spark.sources.events import parse_change_events

    changes = parse_change_events(_events_as_cdc_json(spark, sf_dir))
    hwm = changes.agg(F.expr("(min(seq) + max(seq)) div 2").alias("_hwm"))
    return replication_lag_summary(
        changes.crossJoin(F.broadcast(hwm)),
        F.col("_hwm"),
        key_cols=["conv_id", "turn_idx"],
    )


def _q_cdc_patch_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-update (patch-style) CDC merge: update events do not
    restate every column — a deterministic rewrite marks ``tool`` as
    unchanged on every update, ``text`` on every third event, ``role``
    on every second (the Debezium TOAST-placeholder shape). Column-
    level LWW (``lww_patch``) resolves each column to its value in the
    latest event that actually carried it — one hash aggregate, same
    shuffle shape as the row-level path."""
    from embulk_util_json_spark.operators.lww import lww_patch
    from embulk_util_json_spark.sources.events import parse_change_events

    changes = parse_change_events(_events_as_cdc_json(spark, sf_dir))
    patched = _patchify(changes)
    final = lww_patch(
        patched,
        ["conv_id", "turn_idx"],
        ["ts", "seq"],
        patch_cols=["role", "text", "tool"],
        unchanged_marker=_PATCH_MARKER,
        absent_if=F.col("op") == "delete",
    )
    return final.filter(F.col("op") != "delete").select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


_ORACLE_CDC_PATCH_FINAL = f"""
    WITH changes AS ({_ORACLE_CDC_EVENTS}),
    patched AS (
        SELECT seq, op, ts, conv_id, turn_idx,
            {_ORACLE_PATCH_CASES}
        FROM changes
    ),
    resolved AS (
        SELECT conv_id, turn_idx,
            (last_value(CASE WHEN role IS DISTINCT FROM '{_PATCH_MARKER}'
                 AND op <> 'delete'
                 THEN {{'v': role}} END IGNORE NULLS) OVER w).v AS role,
            (last_value(CASE WHEN text IS DISTINCT FROM '{_PATCH_MARKER}'
                 AND op <> 'delete'
                 THEN {{'v': text}} END IGNORE NULLS) OVER w).v AS text,
            (last_value(CASE WHEN tool IS DISTINCT FROM '{_PATCH_MARKER}'
                 AND op <> 'delete'
                 THEN {{'v': tool}} END IGNORE NULLS) OVER w).v AS tool,
            last_value(op) OVER w AS op,
            last_value(ts) OVER w AS ts,
            ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC
            ) AS rn
        FROM patched
        WINDOW w AS (
            PARTITION BY conv_id, turn_idx ORDER BY ts, seq
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    )
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM resolved WHERE rn = 1 AND op <> 'delete'
"""


_ORACLE_PATCH_STATE_TTL = f"""
    WITH changes0 AS ({_ORACLE_CDC_EVENTS}),
    changes AS (
        SELECT seq, op, conv_id, turn_idx, role, text, tool,
            TIMESTAMP '2025-01-01 00:00:00'
                + (INTERVAL 1 SECOND) * ((turn_idx % 3) * 3600 + (seq % 3000))
                AS ts
        FROM changes0
    ),
    patched AS (
        SELECT seq, op, ts, conv_id, turn_idx,
            {_ORACLE_PATCH_CASES}
        FROM changes
    ),
    resolved AS (
        SELECT conv_id, turn_idx,
            (last_value(CASE WHEN role IS DISTINCT FROM '{_PATCH_MARKER}'
                 AND op <> 'delete'
                 THEN {{'v': role}} END IGNORE NULLS) OVER w).v AS role,
            (last_value(CASE WHEN text IS DISTINCT FROM '{_PATCH_MARKER}'
                 AND op <> 'delete'
                 THEN {{'v': text}} END IGNORE NULLS) OVER w).v AS text,
            (last_value(CASE WHEN tool IS DISTINCT FROM '{_PATCH_MARKER}'
                 AND op <> 'delete'
                 THEN {{'v': tool}} END IGNORE NULLS) OVER w).v AS tool,
            last_value(op) OVER w AS op,
            last_value(ts) OVER w AS ts,
            ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC
            ) AS rn
        FROM patched
        WINDOW w AS (
            PARTITION BY conv_id, turn_idx ORDER BY ts, seq
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    )
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM resolved WHERE rn = 1 AND op <> 'delete'
"""


def _q_cdc_patch_final_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage patch merge (``lww_patch_salted``): the
    hot-conversation skew split applied to the COLUMN-level LWW path.
    Stage 1 reduces (key, salt) shards with the stamped reduction —
    shard winners keep per-column order stamps — stage 2 merges ≤ 32
    shard winners per key; exact because per-column max over the
    (ts, seq) total order is associative + commutative. Same oracle
    as ``cdc_patch_final_state``: the split must be invisible."""
    from embulk_util_json_spark.operators.lww import lww_patch_salted
    from embulk_util_json_spark.sources.events import parse_change_events

    changes = parse_change_events(_events_as_cdc_json(spark, sf_dir))
    patched = _patchify(changes)
    final = lww_patch_salted(
        patched,
        ["conv_id", "turn_idx"],
        ["ts", "seq"],
        patch_cols=["role", "text", "tool"],
        unchanged_marker=_PATCH_MARKER,
        absent_if=F.col("op") == "delete",
        salt_buckets=32,
    )
    return final.filter(F.col("op") != "delete").select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


def _q_cdc_patch_sink_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patch-mode SINK replay: the same partial-update stream as
    ``cdc_patch_final_state``, but applied INCREMENTALLY — three
    interleaved micro-batches (``seq % 3``, so every batch carries
    early and late events for the same keys) through a merge-on-read
    ``ParquetSnapshotSink(patch_cols=...)``, compacted, then read.

    Must equal the one-shot full-history oracle exactly: the sink
    stores per-column order stamps (``_po_<col>``) with each reduced
    row, making column-level LWW a closed associative operator —
    chain-merge of persisted levels ≡ one reduction over the raw
    history, however the events were batched. This is the TOAST-
    column / sparse-update ingest path at 10^10 events: write cost
    stays O(batch) (MOR), carry-forward costs one extra struct column
    per patch column, and the merge is still ONE hash aggregate with
    map-side combine."""
    from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
    from embulk_util_json_spark.sources.events import parse_change_events

    changes = parse_change_events(_events_as_cdc_json(spark, sf_dir))
    patched = _patchify(changes)
    work = _scratch("patch_sink_")
    sink = ParquetSnapshotSink(
        spark, os.path.join(work, "t"), num_buckets=8, mode="mor",
        patch_cols=["role", "text", "tool"], unchanged_marker=_PATCH_MARKER,
    )
    for i in range(3):
        sink.apply(patched.filter(F.col("seq") % 3 == i), f"b{i}")
    sink.compact(drop_tombstones=False)
    return sink.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def _q_cdc_patch_evolution_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patch-COLUMN evolution mid-stream: for the first half of the
    binlog (seq ≤ max/2) change events do not carry ``tool`` at all;
    ``evolve_patch_cols({"tool": "string"})`` then extends the
    column-level-LWW set — METADATA-ONLY (no stored file is touched;
    pre-evolution levels align to typed-NULL value + NULL stamp at
    merge time, which is exactly "never present yet") — and the second
    half patches it like any other column. Final state must equal one
    full-history column-level LWW in which early events simply never
    carry the column. This is the additive-schema-evolution story of
    the north rule applied to the MERGE CONFIG itself: at 10^10
    events, re-stamping a 100 TB table to add a column would be a
    full rewrite; the manifest-versioned config + lazy alignment costs
    zero data movement."""
    from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
    from embulk_util_json_spark.sources.events import parse_change_events

    changes = parse_change_events(_events_as_cdc_json(spark, sf_dir))
    mid = changes.agg(F.max("seq")).collect()[0][0] // 2  # 1-row bound
    patched = _patchify(changes)
    early = patched.filter(F.col("seq") <= mid).drop("tool")
    late = patched.filter(F.col("seq") > mid)
    work = _scratch("patch_evo_")
    sink = ParquetSnapshotSink(
        spark, os.path.join(work, "t"), num_buckets=8, mode="mor",
        patch_cols=["role", "text"], unchanged_marker=_PATCH_MARKER,
    )
    for i in range(2):
        sink.apply(early.filter(F.col("seq") % 2 == i), f"e{i}")
    sink.evolve_patch_cols({"tool": "string"})
    for i in range(2):
        sink.apply(late.filter(F.col("seq") % 2 == i), f"l{i}")
    sink.compact(drop_tombstones=False)
    return sink.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")


_ORACLE_CDC_PATCH_EVOLUTION = f"""
    WITH changes AS ({_ORACLE_CDC_EVENTS}),
    patched AS (
        SELECT seq, op, ts, conv_id, turn_idx,
            {_ORACLE_PATCH_CASES},
            seq > (SELECT MAX(seq) // 2 FROM changes) AS has_tool
        FROM changes
    ),
    resolved AS (
        SELECT conv_id, turn_idx,
            (last_value(CASE WHEN role IS DISTINCT FROM '{_PATCH_MARKER}'
                 AND op <> 'delete'
                 THEN {{'v': role}} END IGNORE NULLS) OVER w).v AS role,
            (last_value(CASE WHEN text IS DISTINCT FROM '{_PATCH_MARKER}'
                 AND op <> 'delete'
                 THEN {{'v': text}} END IGNORE NULLS) OVER w).v AS text,
            (last_value(CASE WHEN tool IS DISTINCT FROM '{_PATCH_MARKER}'
                 AND op <> 'delete' AND has_tool
                 THEN {{'v': tool}} END IGNORE NULLS) OVER w).v AS tool,
            last_value(op) OVER w AS op,
            last_value(ts) OVER w AS ts,
            ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC
            ) AS rn
        FROM patched
        WINDOW w AS (
            PARTITION BY conv_id, turn_idx ORDER BY ts, seq
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    )
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM resolved WHERE rn = 1 AND op <> 'delete'
"""


def _q_cdc_patch_state_ttl_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING column-level LWW with event-time state TTL, driven as
    a real Structured Streaming query (``streaming/patch_state.
    resolved_patch_state`` → applyInPandasWithState, EventTimeTimeout,
    availableNow drain into a memory sink) — not a batch emulation.

    Fixture: events are RE-CLOCKED into disjoint per-key-lifetime time
    regions — ``ts = 2025-01-01 + (turn_idx % 3) hours + (seq % 3000)
    seconds``, a pure-arithmetic derivation both engines compute — and
    streamed as one micro-batch file per region, so (a) batches are
    event-time-ordered (a watermark with 0 delay drops nothing as
    late) and (b) a key's FULL history lives in one region: once its
    region's hour passes, the 1800-second TTL EVICTS it from the state
    store (asserted via the query's state-operator metrics) and it is
    never patched again, so eviction bounds state without changing
    output. Final per-key snapshot must equal the one-shot
    full-history column-level LWW over the re-clocked stream."""
    import glob
    import shutil

    from embulk_util_json_spark.sources.events import parse_change_events
    from embulk_util_json_spark.streaming.patch_state import resolved_patch_state

    work = _scratch("pst_")
    changes = parse_change_events(_events_as_cdc_json(spark, sf_dir)).withColumn(
        "ts",
        F.expr(
            "timestamp'2025-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, "
            "(turn_idx % 3) * 3600 + (seq % 3000))"
        ),
    )
    # pin the fixture once: the three per-region coalesce(1) writes
    # would each recompute the concat→parse→patchify pipeline
    patched = _patchify(changes).localCheckpoint()
    src = os.path.join(work, "stream")
    os.makedirs(src)
    for i in range(3):
        tmp = os.path.join(work, f"tmp{i}")
        patched.filter(F.col("turn_idx") % 3 == i).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src, f"{i:02d}.parquet")
        shutil.move(part, dst)
        # distinct ascending mtimes pin the file->micro-batch order
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    stream = (
        spark.readStream.schema(patched.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    resolved = resolved_patch_state(
        stream,
        ["role", "text", "tool"],
        keys=["conv_id", "turn_idx"],
        order_cols=["ts", "seq"],
        unchanged_marker=_PATCH_MARKER,
        state_ttl_sec=1800.0,
        watermark_delay_sec=0.0,
    )
    name = "pst_" + os.path.basename(work).replace("pst_", "")
    q = (
        resolved.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state_rows = q.recentProgress[-1]["stateOperators"][0]["numRowsTotal"]
    n_keys = patched.select("conv_id", "turn_idx").distinct().count()
    assert state_rows < n_keys, (
        f"fixture must exercise TTL eviction: state holds {state_rows} "
        f"of {n_keys} keys"
    )
    snap = spark.table(name)
    final = (
        snap.groupBy("conv_id", "turn_idx")
        .agg(
            F.max_by(
                F.struct("op", "ts", "role", "text", "tool"),
                F.struct("ts", "seq"),
            ).alias("s")
        )
        .select("conv_id", "turn_idx", "s.*")
    )
    return final.filter(F.col("op") != "delete").select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


def _q_cdc_txn_stream_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-transaction atomicity driven through a REAL Structured
    Streaming drain: a multiplexed directory stream (row events +
    commit/abort markers in one feed, demuxed per micro-batch by a
    ``kind`` column) feeds ``TxnBoundaryApplier`` from inside
    ``foreachBatch`` with an availableNow trigger — the durable
    pending/marker stores carry open transactions ACROSS streaming
    epochs. Markers lag the rows by one file, so batch 0 must hold
    committed-but-unmarked transactions; the final file delivers the
    remaining markers and drains them. Aborts (txid % 11 = 5) drop;
    the last transaction never gets a marker and stays invisible.
    Final table = LWW over rows of committed transactions only —
    the same oracle as the batch-mode twin."""
    import glob
    import shutil

    from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
    from embulk_util_json_spark.streaming.txn_boundary import TxnBoundaryApplier

    work = _scratch("txs_")
    ev = _events_as_cdc_json(spark, sf_dir).withColumn(
        "txid", F.expr("seq div 64")
    )
    hi = int(ev.agg(F.max("seq").alias("m")).collect()[0].m)
    mx_txid, cut_seq = hi // 64, (hi * 2) // 3
    cut_txid = cut_seq // 64
    markers = (
        ev.select("txid")
        .distinct()
        .filter(F.col("txid") < mx_txid)
        .select(
            "txid",
            F.when(F.col("txid") % 11 == 5, F.lit("abort"))
            .otherwise(F.lit("commit"))
            .alias("status"),
        )
    )
    rows_part = ev.select(
        F.lit("row").alias("kind"), "seq", "event_json", "txid",
        F.lit(None).cast("string").alias("status"),
    )
    mk_part = markers.select(
        F.lit("marker").alias("kind"),
        F.lit(None).cast("long").alias("seq"),
        F.lit(None).cast("string").alias("event_json"),
        "txid", "status",
    )
    feed_schema = rows_part.schema
    src = os.path.join(work, "stream")
    os.makedirs(src)
    files = [
        rows_part.filter(F.col("seq") < cut_seq).unionByName(
            mk_part.filter(F.col("txid") <= cut_txid - 3)
        ),
        rows_part.filter(F.col("seq") >= cut_seq).unionByName(
            mk_part.filter(F.col("txid") > cut_txid - 3)
        ),
    ]
    for i, part_df in enumerate(files):
        tmp = os.path.join(work, f"tmp{i}")
        part_df.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src, f"{i:02d}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    sink = ParquetSnapshotSink(spark, os.path.join(work, "t"), num_buckets=8)
    ap = TxnBoundaryApplier(spark, sink, os.path.join(work, "txn"))
    seen = {"held": False}

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        rows = batch_df.filter(F.col("kind") == "row").select(
            "seq", "event_json", "txid"
        )
        mks = batch_df.filter(F.col("kind") == "marker").select(
            "txid", "status"
        )
        r = ap.apply(rows, mks)
        if r.get("held_batch"):
            seen["held"] = True

    q = (
        spark.readStream.schema(feed_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert seen["held"], "fixture must hold committed-but-unmarked txns"
    return sink.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def _q_cdc_patch_promote_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW-LEVEL → PATCH conversion mid-stream: the first half of the
    binlog is applied under plain row-level LWW (every event restates
    all columns), then ``evolve_patch_cols`` PROMOTES role/text/tool —
    one manifest-committed rewrite that collapses the stored chains
    under the old config and stamps each surviving row's columns at
    the row's own (ts, seq) — and the second half arrives as marker-
    patterned partial updates merged column-level. Contract: the
    collapsed pre-history re-enters the merge as pseudo-events at the
    winners' positions (promotion cannot resurrect history that
    row-level applies already collapsed), so the oracle is
    ``lww_patch`` over (row-level winners of the first half) ∪
    (second-half patches)."""
    from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
    from embulk_util_json_spark.sources.events import parse_change_events

    changes = parse_change_events(_events_as_cdc_json(spark, sf_dir))
    mid = changes.agg(F.max("seq")).collect()[0][0] // 2
    dense = changes.select("seq", "op", "ts", "conv_id", "turn_idx", "role", "text", "tool")
    late = _patchify(dense.filter(F.col("seq") > mid))
    work = _scratch("patch_promote_")
    sink = ParquetSnapshotSink(
        spark, os.path.join(work, "t"), num_buckets=8, mode="mor"
    )
    for i in range(2):
        sink.apply(
            dense.filter((F.col("seq") <= mid) & (F.col("seq") % 2 == i)), f"e{i}"
        )
    sink.evolve_patch_cols(
        {"role": "string", "text": "string", "tool": "string"},
        unchanged_marker=_PATCH_MARKER,
    )
    for i in range(2):
        sink.apply(late.filter(F.col("seq") % 2 == i), f"l{i}")
    sink.compact(drop_tombstones=False)
    return sink.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")


_ORACLE_CDC_PATCH_PROMOTE = f"""
    WITH changes AS ({_ORACLE_CDC_EVENTS}),
    mid AS (SELECT MAX(seq) // 2 AS v FROM changes),
    collapsed AS (
        SELECT conv_id, turn_idx, ts, seq, op, role, text, tool
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC
            ) AS rn
            FROM changes WHERE seq <= (SELECT v FROM mid)
        ) WHERE rn = 1
    ),
    late AS (
        SELECT conv_id, turn_idx, ts, seq, op,
            {_ORACLE_PATCH_CASES}
        FROM changes WHERE seq > (SELECT v FROM mid)
    ),
    hist AS (
        SELECT * FROM collapsed UNION ALL SELECT * FROM late
    ),
    resolved AS (
        SELECT conv_id, turn_idx,
            (last_value(CASE WHEN role IS DISTINCT FROM '{_PATCH_MARKER}'
                 AND op <> 'delete'
                 THEN {{'v': role}} END IGNORE NULLS) OVER w).v AS role,
            (last_value(CASE WHEN text IS DISTINCT FROM '{_PATCH_MARKER}'
                 AND op <> 'delete'
                 THEN {{'v': text}} END IGNORE NULLS) OVER w).v AS text,
            (last_value(CASE WHEN tool IS DISTINCT FROM '{_PATCH_MARKER}'
                 AND op <> 'delete'
                 THEN {{'v': tool}} END IGNORE NULLS) OVER w).v AS tool,
            last_value(op) OVER w AS op,
            last_value(ts) OVER w AS ts,
            ROW_NUMBER() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC
            ) AS rn
        FROM hist
        WINDOW w AS (
            PARTITION BY conv_id, turn_idx ORDER BY ts, seq
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    )
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM resolved WHERE rn = 1 AND op <> 'delete'
"""


def _q_cdc_debezium_patch_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE canonical partial-update ingest path end-to-end: the
    marker-patterned change stream re-wrapped into Debezium wire
    envelopes (string row images, ``source.ts_us`` for lossless event
    time), parsed back through the Debezium adapter, and applied in
    two micro-batches through a patch-mode MOR sink whose
    ``unchanged_marker`` is the placeholder the wire carries — the
    Postgres TOAST / ``unavailable.value.placeholder`` contract.
    Adapter round-trip preserves the marker / explicit-NULL / value
    trichotomy byte-for-byte (strings pass through untouched), so the
    oracle is the same full-history column-level LWW as
    ``cdc_patch_final_state``."""
    from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
    from embulk_util_json_spark.sources.debezium import parse_debezium_events
    from embulk_util_json_spark.sources.events import parse_change_events

    patched = _patchify(parse_change_events(_events_as_cdc_json(spark, sf_dir)))
    is_del = F.col("op") == "delete"
    data = F.create_map(
        F.lit("conv_id"), F.col("conv_id"),
        F.lit("turn_idx"), F.col("turn_idx").cast("string"),
        F.lit("role"), F.col("role"),
        F.lit("text"), F.col("text"),
        F.lit("tool"), F.col("tool"),
    )
    op_code = (
        F.when(F.col("op") == "insert", F.lit("c"))
        .when(F.col("op") == "update", F.lit("u"))
        .otherwise(F.lit("d"))
    )
    envelope = F.to_json(
        F.struct(
            F.when(is_del, data).alias("before"),
            F.when(~is_del, data).alias("after"),
            F.struct(
                F.unix_millis(F.col("ts")).alias("ts_ms"),
                F.unix_micros(F.col("ts")).alias("ts_us"),
                F.lit("transcripts").alias("table"),
            ).alias("source"),
            op_code.alias("op"),
            F.unix_millis(F.col("ts")).alias("ts_ms"),
        )
    )
    wire = patched.select("seq", envelope.alias("event_json"))
    changes = parse_debezium_events(wire)
    work = _scratch("dbz_patch_")
    sink = ParquetSnapshotSink(
        spark, os.path.join(work, "t"), num_buckets=8, mode="mor",
        patch_cols=["role", "text", "tool"], unchanged_marker=_PATCH_MARKER,
    )
    for i in range(2):
        sink.apply(changes.filter(F.col("seq") % 2 == i), f"b{i}")
    return sink.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def _q_cdc_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew advisor, hot-key view: top-20 hottest conversations in the
    change stream with exact count, share, and the per-key salt factor
    a 32-partition apply stage needs (``ceil(cnt·32/total)`` in pure
    integer arithmetic). ONE hash agg over conv_id (map-side combine),
    total via a reused-exchange 1-row agg, top-k via TakeOrdered —
    nothing rescans the events."""
    from embulk_util_json_spark.pipeline.skew import key_histogram
    from embulk_util_json_spark.sources.events import parse_change_events

    changes = parse_change_events(_events_as_cdc_json(spark, sf_dir))
    return key_histogram(changes, ["conv_id"], top_k=20, parallelism=32)


def _q_cdc_skew_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew advisor, stream-shape view: rows / keys / max-vs-avg key
    load / hot ratio in one aggregation pass — the per-batch health
    metric that decides whether the salted apply path is worth its
    extra shuffle stage."""
    from embulk_util_json_spark.pipeline.skew import skew_summary
    from embulk_util_json_spark.sources.events import parse_change_events

    changes = parse_change_events(_events_as_cdc_json(spark, sf_dir))
    return skew_summary(changes, ["conv_id", "turn_idx"])


def _q_cdc_disorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark advisor: measure the change stream's event-time
    disorder (lateness vs the delivery-order running max of ts) with
    the two-pass DISTRIBUTED prefix scan — range-partitioned per-range
    maxima + driver prefix fold + parallel within-range windows — and
    report the watermark that would have dropped nothing. The oracle
    is the naive single-window formulation; hash equality proves the
    distributed scan exact.

    The driver's events table is perfectly time-ordered, so the query
    injects deterministic disorder first — each event's ts is pulled
    back by ``(seq % 97)`` minutes (a delivery-delay model) on BOTH
    the Spark and the oracle side — making the measured lateness
    non-trivial."""
    from embulk_util_json_spark.pipeline.disorder import disorder_summary
    from embulk_util_json_spark.sources.events import parse_change_events

    changes = parse_change_events(_events_as_cdc_json(spark, sf_dir)).withColumn(
        "ts",
        F.timestamp_micros(
            F.unix_micros("ts") - (F.col("seq") % 97) * F.lit(60_000_000)
        ),
    )
    return disorder_summary(changes, ts_col="ts", seq_col="seq", n_ranges=64)


def _q_cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass parse with additive schema evolution: unseen 'model'
    field rides the _extras map and is materialized as a string column;
    rows without it read NULL."""
    from embulk_util_json_spark.operators.lww import lww_agg
    from embulk_util_json_spark.sources.events import (
        EXTRAS_COL,
        parse_change_events_single_pass,
    )

    events = _events_as_cdc_json_evolving(spark, sf_dir)
    changes = parse_change_events_single_pass(events)
    changes = changes.withColumn("model", F.col(EXTRAS_COL)["model"]).drop(EXTRAS_COL)
    final = lww_agg(changes, ["conv_id", "turn_idx"], ["ts", "seq"])
    return final.filter(F.col("op") != "delete").select(
        "conv_id", "turn_idx", "role", "text", "tool", "model", "ts"
    )


_ORACLE_CDC_EVOLUTION = """
    WITH changes AS (
        SELECT
            event_id AS seq,
            CASE WHEN event_type = 'error' THEN 'delete'
                 WHEN event_type = 'signup' THEN 'insert'
                 ELSE 'update' END AS op,
            ts,
            'u' || CAST(user_id AS VARCHAR) AS conv_id,
            CAST(event_id % 25 AS INTEGER) AS turn_idx,
            'r' || CAST(event_id % 4 AS VARCHAR) AS role,
            'text ' || CAST(event_id AS VARCHAR) AS text,
            event_type AS tool,
            CASE WHEN event_id % 5 = 0 THEN 'm-2' END AS model
        FROM events
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC
        ) AS rn
        FROM changes
    )
    SELECT conv_id, turn_idx, role, text, tool, model, ts
    FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def _q_cdc_ddl_gated_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict DDL-gated schema evolution: a schema-change envelope
    ({"op":"ddl","ddl":{"action":"add_column","column":"model"}}) at
    the seq midpoint authorizes the 'model' column; rows carrying the
    member BEFORE that position keep it quarantined in _extras (it
    must not silently become data), rows at/after materialize it.
    The gate compiles to a pure CASE projection (no join) and runs
    before the LWW reduction, so the winner's own position decides
    its model value — mirrored exactly by the oracle's CASE."""
    from embulk_util_json_spark.operators.ddl import (
        apply_ddl_gate,
        ddl_authorizations,
        parse_ddl_events,
    )
    from embulk_util_json_spark.operators.lww import lww_agg
    from embulk_util_json_spark.sources.events import (
        EXTRAS_COL,
        parse_change_events_single_pass,
    )

    ev = _events_as_cdc_json_evolving(spark, sf_dir)
    ddl_json = (
        '{"op":"ddl","ts":"2024-01-01 00:00:00.000000",'
        '"ddl":{"action":"add_column","column":"model"}}'
    )
    ddl_row = ev.agg(F.expr("max(seq) div 2").alias("seq")).select(
        "seq", F.lit(ddl_json).alias("event_json")
    )
    stream = ev.unionByName(ddl_row)
    auth = ddl_authorizations(parse_ddl_events(stream))
    changes = parse_change_events_single_pass(stream).filter(
        F.col("op") != "ddl"
    )
    gated = apply_ddl_gate(changes, auth).drop(EXTRAS_COL)
    final = lww_agg(gated, ["conv_id", "turn_idx"], ["ts", "seq"])
    return final.filter(F.col("op") != "delete").select(
        "conv_id", "turn_idx", "role", "text", "tool", "model", "ts"
    )


_ORACLE_DDL_GATED = """
    WITH changes AS (
        SELECT
            event_id AS seq,
            CASE WHEN event_type = 'error' THEN 'delete'
                 WHEN event_type = 'signup' THEN 'insert'
                 ELSE 'update' END AS op,
            ts,
            'u' || CAST(user_id AS VARCHAR) AS conv_id,
            CAST(event_id % 25 AS INTEGER) AS turn_idx,
            'r' || CAST(event_id % 4 AS VARCHAR) AS role,
            'text ' || CAST(event_id AS VARCHAR) AS text,
            event_type AS tool,
            CASE WHEN event_id % 5 = 0 THEN 'm-2' END AS model
        FROM events
    ),
    mid AS (SELECT MAX(seq) // 2 AS m FROM changes),
    gated AS (
        SELECT c.seq, c.op, c.ts, c.conv_id, c.turn_idx, c.role,
               c.text, c.tool,
               CASE WHEN c.seq >= mid.m THEN c.model END AS model
        FROM changes c, mid
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC
        ) AS rn
        FROM gated
    )
    SELECT conv_id, turn_idx, role, text, tool, model, ts
    FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def _q_cdc_policy_merge_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column merge policies in one hash aggregation: role/text/
    tool/ts keep LWW, tokens (= length(text), integer so both engines
    sum exactly) ACCUMULATES across every delivery, first_ts keeps
    the first writer, n_events counts deliveries. Row existence is
    still the LWW winner's op — identical tombstone semantics to the
    plain apply. Oracle: ranked-winner join against a GROUP BY with
    the same aggregates (SUM cast to BIGINT — DuckDB SUM returns
    HUGEINT)."""
    from embulk_util_json_spark.operators.lww import policy_agg
    from embulk_util_json_spark.sources.events import parse_change_events

    changes = parse_change_events(_events_as_cdc_json(spark, sf_dir))
    df = changes.select(
        "op", "ts", "seq", "conv_id", "turn_idx", "role", "text", "tool",
        F.length("text").cast("long").alias("tokens"),
        F.col("ts").alias("first_ts"),
    )
    merged = policy_agg(
        df,
        ["conv_id", "turn_idx"],
        ["ts", "seq"],
        {
            "role": "lww",
            "text": "lww",
            "tool": "lww",
            "ts": "lww",
            "tokens": "sum",
            "first_ts": "first",
            "n_events": "count",
        },
    )
    return merged.filter(F.col("op") != "delete").select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
        "tokens", "first_ts", "n_events",
    )


_ORACLE_POLICY_MERGE = f"""
    WITH changes AS ({_ORACLE_CDC_EVENTS}),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC
        ) AS rn
        FROM changes
    ),
    agg AS (
        SELECT conv_id, turn_idx,
               CAST(SUM(LENGTH(text)) AS BIGINT) AS tokens,
               MIN(ts) AS first_ts,
               COUNT(*) AS n_events
        FROM changes GROUP BY conv_id, turn_idx
    )
    SELECT r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts,
           a.tokens, a.first_ts, a.n_events
    FROM ranked r
    JOIN agg a ON r.conv_id = a.conv_id AND r.turn_idx = a.turn_idx
    WHERE r.rn = 1 AND r.op <> 'delete'
"""


def _q_cdc_apply_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The literal north-star LWW formulation: row_number() over
    (conv_id, turn_idx) ordered by (ts, seq) desc — oracle-equal to
    the aggregation-based scale path."""
    from embulk_util_json_spark.operators.lww import lww_window
    from embulk_util_json_spark.sources.events import parse_change_events

    events = _events_as_cdc_json(spark, sf_dir)
    changes = parse_change_events(events)
    final = lww_window(changes, ["conv_id", "turn_idx"], ["ts", "seq"])
    return final.filter(F.col("op") != "delete").select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


def _q_cdc_apply_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted LWW (hot-key path) — exact because argmax over
    the (ts, seq) total order is associative and commutative."""
    from embulk_util_json_spark.operators.lww import lww_salted
    from embulk_util_json_spark.sources.events import parse_change_events

    events = _events_as_cdc_json(spark, sf_dir)
    changes = parse_change_events(events)
    final = lww_salted(changes, ["conv_id", "turn_idx"], ["ts", "seq"], salt_buckets=16)
    return final.filter(F.col("op") != "delete").select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


__all__ = [
    "_wire_format_final_state",
    "_q_cdc_debezium_final_state",
    "_q_cdc_maxwell_final_state",
    "_q_cdc_canal_final_state",
    "_q_cdc_wal2json_final_state",
    "_q_cdc_wal2json_txn_final_state",
    "_q_cdc_mongo_final_state",
    "_q_cdc_kafka_final_state",
    "_q_cdc_config_ingest_final_state",
    "_q_cdc_config_stream_final_state",
    "_q_cdc_kafka_upsert_topic_final_state",
    "_ORACLE_KAFKA_UPSERT",
    "_q_cdc_mongo_patch_final_state",
    "_ORACLE_MONGO_PATCH_FINAL",
    "_ORACLE_CDC_FINAL_MS",
    "_ORACLE_CDC_FINAL_SEC",
    "_q_cdc_seq_gaps",
    "_q_cdc_seq_summary",
    "_q_cdc_dlq_repair_final_state",
    "_seq_gaps_oracle",
    "_seq_summary_oracle",
    "_q_cdc_gap_fenced_apply",
    "_ORACLE_GAP_FENCED",
    "_q_cdc_fenced_replay_final_state",
    "_q_cdc_chunked_bootstrap_final_state",
    "_q_cdc_sharded_fenced_final_state",
    "_ORACLE_SHARDED_FENCED",
    "_q_cdc_txn_boundary_final_state",
    "_ORACLE_TXN_BOUNDARY",
    "_q_cdc_before_image_conflicts",
    "_ORACLE_BEFORE_IMAGE",
    "_q_cdc_pk_change_final_state",
    "_ORACLE_PK_CHANGE",
    "_q_cdc_replication_lag",
    "_q_cdc_patch_final_state",
    "_ORACLE_CDC_PATCH_FINAL",
    "_ORACLE_PATCH_STATE_TTL",
    "_q_cdc_patch_final_salted",
    "_q_cdc_patch_sink_final_state",
    "_q_cdc_patch_evolution_final_state",
    "_ORACLE_CDC_PATCH_EVOLUTION",
    "_q_cdc_patch_state_ttl_final",
    "_q_cdc_txn_stream_final",
    "_q_cdc_patch_promote_final_state",
    "_ORACLE_CDC_PATCH_PROMOTE",
    "_q_cdc_debezium_patch_final_state",
    "_q_cdc_hot_keys",
    "_q_cdc_skew_summary",
    "_q_cdc_disorder_stats",
    "_q_cdc_schema_evolution",
    "_ORACLE_CDC_EVOLUTION",
    "_q_cdc_ddl_gated_evolution",
    "_ORACLE_DDL_GATED",
    "_q_cdc_policy_merge_final_state",
    "_ORACLE_POLICY_MERGE",
    "_q_cdc_apply_window",
    "_q_cdc_apply_salted",
]
