"""Auto-split from __spark_entry__.py (round 5): training-data pipeline queries: transcripts, dedup, text stats, similarity, sampling, multimodal

Part of the driver registry package — every ``_q_*`` callable is a
``(spark, sf_dir) -> DataFrame`` query and every ``_ORACLE_*`` /
``*_oracle`` value is its DuckDB ANSI-SQL twin. See
``__spark_entry__.queries()`` for the graded registry order.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from .common import *  # noqa: F401,F403 — shared fixtures/oracle fragments


def _q_transcript_view_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized view (derived-table maintenance): the
    change stream applies to the base transcripts sink in 2 seq-range
    micro-batches, and after each apply the assembled-conversations
    view refreshes ONLY the touched conv_ids (probe_keys-pruned source
    read → MERGE into a conv_id-keyed view sink). The oracle is a full
    reassembly of the CDC final state — the incremental maintenance
    must converge to it exactly. (At toy scale the wall time is almost
    entirely the 4 fixed micro-batch apply costs; the per-batch work
    itself is O(touched), which is the property that matters at 10^10
    events.)"""
    from embulk_util_json_spark.pipeline.views import IncrementalConversationView
    from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
    from embulk_util_json_spark.sources.events import parse_change_events_single_pass

    work = _scratch("incr_view_")
    events = _events_as_cdc_json(spark, sf_dir)
    sink = ParquetSnapshotSink(spark, os.path.join(work, "base"), num_buckets=4)
    view = IncrementalConversationView(
        spark, sink, os.path.join(work, "view"), num_buckets=4
    )
    b = events.agg(F.min("seq").alias("lo"), F.max("seq").alias("hi")).collect()[0]
    step = (int(b.hi) - int(b.lo)) // 2 + 1
    for i in range(2):
        lo = int(b.lo) + i * step
        batch = events.filter((F.col("seq") >= lo) & (F.col("seq") < lo + step))
        # apply and refresh both consume the parse: checkpoint so the
        # envelope JSON is parsed once per micro-batch
        changes = parse_change_events_single_pass(batch).localCheckpoint()
        sink.apply(changes, f"b{i}")
        view.refresh(changes, f"b{i}:view")
    return view.read().select("conv_id", "document", "n_turns")


def _q_transcript_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline: CDC replay final state → one document per
    conversation (turns sorted by turn_idx, 'role: text' lines) — the
    transcript→document flattening before text-level ops."""
    from embulk_util_json_spark.pipeline.transcripts import assemble_conversations

    return assemble_conversations(_final_state(spark, sf_dir))


def _q_transcript_truncate_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window truncation over the replayed table: keep each
    conversation's latest turns fitting a 120-token budget (BPE-ish
    token counts, reverse cumulative sum — oldest turns drop first)."""
    from embulk_util_json_spark.pipeline.transcripts import truncate_to_budget

    out = truncate_to_budget(_final_state(spark, sf_dir), budget=120)
    return out.select(
        "conv_id", "turn_idx", "role", "text", "n_tokens", "cum_tokens"
    )


def _q_transcript_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation structure metrics over the replayed table
    (turn count, role count, tool-call count, chars, contiguity)."""
    from embulk_util_json_spark.pipeline.transcripts import conversation_stats

    return conversation_stats(_final_state(spark, sf_dir))


def _q_transcript_role_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-format lint: consecutive same-role turns per conversation
    (lag window over turn order)."""
    from embulk_util_json_spark.pipeline.transcripts import (
        role_alternation_violations,
    )

    return role_alternation_violations(_final_state(spark, sf_dir))


def _pii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with deterministic synthetic PII injected (the corpus
    text itself is PII-free, which would make the oracle comparison a
    trivial all-zeros check): every 3rd doc gains an email, every 5th
    a phone, every 7th an ip, every 11th an ssn."""
    d = _read(spark, sf_dir, "documents")
    i = F.col("doc_id")
    s = i.cast("string")
    add = F.concat(
        F.when(i % 3 == 0, F.concat(F.lit(" user"), s, F.lit("@example.com"))).otherwise(F.lit("")),
        F.when(i % 5 == 0, F.lit(" call 555-123-4567")).otherwise(F.lit("")),
        F.when(i % 7 == 0, F.concat(F.lit(" host 10.0.0."), (i % 250).cast("string"))).otherwise(F.lit("")),
        F.when(i % 11 == 0, F.lit(" ssn 123-45-6789")).otherwise(F.lit("")),
    )
    return d.select("doc_id", F.concat("text", add).alias("text"))


_PII_DOCS_SQL = """(
    SELECT doc_id,
           text ||
           CASE WHEN doc_id % 3 = 0
                THEN ' user' || CAST(doc_id AS VARCHAR) || '@example.com'
                ELSE '' END ||
           CASE WHEN doc_id % 5 = 0 THEN ' call 555-123-4567' ELSE '' END ||
           CASE WHEN doc_id % 7 = 0
                THEN ' host 10.0.0.' || CAST(doc_id % 250 AS VARCHAR)
                ELSE '' END ||
           CASE WHEN doc_id % 11 = 0 THEN ' ssn 123-45-6789' ELSE '' END
               AS text
    FROM documents
)"""


def _q_transcript_merge_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repair transform for the alternation lint: consecutive
    same-role runs collapse into one turn (texts joined in turn
    order), indices re-densified."""
    from embulk_util_json_spark.pipeline.transcripts import (
        merge_consecutive_roles,
    )

    return merge_consecutive_roles(_final_state(spark, sf_dir))


def _dq_sql_rules() -> dict[str, str]:
    """The transcripts DQ rules as ANSI-SQL predicates — the single
    source of truth (valid in both Spark SQL and DuckDB). JVM-free so
    ``oracle_sql()`` never needs an active SparkContext."""
    return {
        "key_not_null": "conv_id IS NOT NULL AND turn_idx IS NOT NULL",
        "turn_in_range": "turn_idx >= 0 AND turn_idx <= 24",
        "role_known": "role IN ('r0','r1','r2','r3')",
        "text_nonempty": "length(text) > 0",
        "ts_not_null": "ts IS NOT NULL",
        "turn_lt_20": "turn_idx < 20",  # deliberately violable
    }


def _dq_rules():
    """(spark rules, mirrored SQL rules) for the transcripts DQ gate —
    Spark side derived from the same SQL text via ``F.expr``."""
    sql_rules = _dq_sql_rules()
    return {k: F.expr(v) for k, v in sql_rules.items()}, sql_rules


def _q_dq_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate over the replayed transcripts table: one scan,
    one aggregate, a (rule, counts) row per constraint."""
    from embulk_util_json_spark.pipeline.dq import dq_summary

    rules, _ = _dq_rules()
    return dq_summary(_final_state(spark, sf_dir), rules)


def _q_dq_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The failing rows with their failed-rule list (comma-joined for
    hash-stable comparison) — the quarantine feed of the DQ gate."""
    from embulk_util_json_spark.pipeline.dq import dq_violations

    rules, _ = _dq_rules()
    out = dq_violations(
        _final_state(spark, sf_dir), rules, ["conv_id", "turn_idx"]
    )
    return out.select(
        "conv_id",
        "turn_idx",
        F.array_join("failed_rules", ",").alias("failed_rules"),
    )


def _dq_oracles() -> dict[str, str]:
    from embulk_util_json_spark.pipeline.dq import (
        dq_summary_sql,
        dq_violations_sql,
    )

    sql_rules = _dq_sql_rules()
    return {
        "dq_summary": dq_summary_sql(_ORACLE_CDC_FINAL, sql_rules),
        "dq_violations": dq_violations_sql(
            _ORACLE_CDC_FINAL, sql_rules, ["conv_id", "turn_idx"]
        ),
    }


def _q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch incremental dedup with durable fingerprint state:
    batch 1 (doc_id < 250) claims its fingerprints, then the full
    corpus arrives as batch 2 — survivors are exactly the rows whose
    fingerprint is still owned by them (first batch wins, min id
    within a batch). State lives in a fingerprint-keyed MOR sink in a
    scratch dir; results are deterministic for fixed batches."""
    from embulk_util_json_spark.pipeline.incremental import (
        IncrementalDeduper,
    )

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    d = IncrementalDeduper(
        spark, _scratch("incr_dedup_"), num_buckets=8
    )
    d.dedupe_batch(docs.filter(F.col("doc_id") < 250), "text", "doc_id", 1)
    survivors = d.dedupe_batch(docs, "text", "doc_id", 2)
    return survivors.select("doc_id")


_ORACLE_DEDUP_INCREMENTAL = """
    WITH d AS (
        SELECT doc_id,
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
        FROM documents
    ),
    owner AS (
        SELECT nt,
               COALESCE(MIN(CASE WHEN doc_id < 250 THEN doc_id END),
                        MIN(doc_id)) AS own
        FROM d GROUP BY nt
    )
    SELECT d.doc_id FROM d JOIN owner o ON d.nt = o.nt AND d.doc_id = o.own
"""


def _q_text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary profile: top-20 word trigrams by occurrence
    (one explode, one gram-keyed hash agg, TakeOrdered top-k)."""
    from embulk_util_json_spark.pipeline.dedup import top_ngrams

    docs = _read(spark, sf_dir, "documents")
    return top_ngrams(docs, "text", "doc_id", n=3, k=20)


def _q_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sample (30%) keyed on the row id — stable
    under repartitioning, corpus growth, and engine (md5 bucket
    arithmetic, no rand())."""
    from embulk_util_json_spark.pipeline.sampling import hash_sample

    docs = _read(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.3).select("doc_id")


def _q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split assignment as a pure function of (id,
    salt): disjoint md5-bucket ranges, exhaustive and reproducible."""
    from embulk_util_json_spark.pipeline.sampling import assign_split

    docs = _read(spark, sf_dir, "documents")
    return assign_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


def _sampling_oracles() -> dict[str, str]:
    from embulk_util_json_spark.pipeline.sampling import (
        assign_split_sql,
        hash_sample_sql,
    )

    return {
        "sample_docs": "SELECT doc_id FROM ("
        + hash_sample_sql("documents", "doc_id", 0.3)
        + ")",
        "split_assign": "SELECT doc_id, split FROM ("
        + assign_split_sql(
            "documents", "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        )
        + ")",
    }


def _q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: greedy contiguous context-window fill per
    id-range group (parallel across groups — no global sequential
    window), token counts from normalized whitespace words."""
    from embulk_util_json_spark.pipeline.dedup import norm_text
    from embulk_util_json_spark.pipeline.packing import pack_sequences

    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.split(norm_text(F.col("text")), " ")).alias("tokens"),
    )
    return pack_sequences(toks, "doc_id", "tokens", budget=256, group_size=100)


def _pack_sequences_oracle() -> str:
    from embulk_util_json_spark.pipeline.packing import pack_sequences_sql

    token_expr = (
        "len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))"
    )
    return pack_sequences_sql(
        "documents", "doc_id", token_expr, budget=256, group_size=100
    )


def _q_export_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composite: the full path from raw change events to a
    train-ready corpus slice — CDC replay final state → transcript
    assembly → quality + language scoring → exact dedup → threshold
    filter. All derived frames share the conv_id aggregation keying,
    so Catalyst reuses the assembled-docs exchange instead of
    recomputing the replay per branch."""
    from embulk_util_json_spark.pipeline.dedup import exact_dup_groups
    from embulk_util_json_spark.pipeline.text import lang_id, quality_score
    from embulk_util_json_spark.pipeline.transcripts import (
        assemble_conversations,
    )

    docs = assemble_conversations(_final_state(spark, sf_dir))
    q = quality_score(docs, "document", ["conv_id"])
    lang = lang_id(docs, "document", ["conv_id"]).select("conv_id", "lang_pred")
    dd = exact_dup_groups(docs, "document", "conv_id").select(
        "conv_id", "is_dup"
    )
    return (
        docs.join(q, "conv_id")
        .join(lang, "conv_id")
        .join(dd, "conv_id")
        .filter(
            (~F.col("is_dup"))
            & (F.col("n_turns") >= 3)
            & (F.col("quality") > 0.2)
        )
        .select(
            "conv_id", "n_turns", "n_chars", "n_words", "quality", "lang_pred"
        )
    )


def _export_training_sql() -> str:
    from embulk_util_json_spark.pipeline.dedup import exact_dup_groups_sql
    from embulk_util_json_spark.pipeline.text import (
        lang_id_sql,
        quality_score_sql,
    )
    from embulk_util_json_spark.pipeline.transcripts import (
        assemble_conversations_sql,
    )

    return f"""
    WITH _docs AS ({assemble_conversations_sql(_ORACLE_CDC_FINAL)}),
    _q AS ({quality_score_sql("_docs", "document", ["conv_id"])}),
    _l AS ({lang_id_sql("_docs", "document", ["conv_id"])}),
    _dd AS ({exact_dup_groups_sql("_docs", "document", "conv_id")})
    SELECT d.conv_id, d.n_turns, q.n_chars, q.n_words, q.quality,
           l.lang_pred
    FROM _docs d
    JOIN _q q ON d.conv_id = q.conv_id
    JOIN _l l ON d.conv_id = l.conv_id
    JOIN _dd dd ON d.conv_id = dd.conv_id
    WHERE NOT dd.is_dup AND d.n_turns >= 3 AND q.quality > 0.2
    """


def _q_pii_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII hit counts (email/phone/ipv4/ssn) — codegen'd
    regexp_count scans, patterns in the Java∩RE2 subset."""
    from embulk_util_json_spark.pipeline.pii import pii_counts

    return pii_counts(_pii_docs(spark, sf_dir), "text", "doc_id")


def _q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: chained regexp_replace to [PII] with a
    chars-removed delta."""
    from embulk_util_json_spark.pipeline.pii import redact_pii

    return redact_pii(_pii_docs(spark, sf_dir), "text", "doc_id")


def _q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition: total vs distinct trigram counts
    and ratio (boilerplate/loop detector)."""
    from embulk_util_json_spark.pipeline.dedup import repetition_stats

    return repetition_stats(
        _read(spark, sf_dir, "documents"), "text", "doc_id", n=3
    )


def _q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination gate: fraction of each document's
    shingles present in the 'benchmark' corpus (docs 0-19 stand in
    for an eval set), benchmark side broadcast."""
    from embulk_util_json_spark.pipeline.dedup import benchmark_contamination

    docs = _read(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 20)
    return benchmark_contamination(docs, bench, "text", "doc_id", n=3)


def _q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization (30-min gap) of the event stream per user —
    lag + cumulative-sum window, one session row per burst."""
    from embulk_util_json_spark.operators.temporal import sessionize

    ev = _read(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    return sessionize(
        ev, ["user_id"], "ts", gap_sec=1800, tiebreak_cols=["event_id"]
    )


_ORACLE_SESSIONIZE = """
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS st
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts,
               CAST(SUM(st) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_id
        FROM ordered
    )
    SELECT user_id, session_id, MIN(ts) AS session_start,
           MAX(ts) AS session_end, CAST(COUNT(*) AS INTEGER) AS n_events
    FROM s GROUP BY user_id, session_id
"""


def _q_events_sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same gap sessionization expressed with Spark's NATIVE
    session_window aggregate (the Structured-Streaming-ready
    formulation — works under watermarks unchanged) — validated
    against the identical oracle as the window/cumsum variant.
    Boundary semantics verified equal: a gap of exactly gap_sec
    merges; strictly greater splits. Ordinal session_id is assigned
    post-hoc by session start order per user."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").select("user_id", "ts")
    sessions = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).cast("int").alias("n_events"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("session_window.start").asc())
    return sessions.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("session_id"),
        "session_start",
        "session_end",
        "n_events",
    )


def _q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every 'error' event picks up the most recent
    non-error event of the same user at or before it (union-tag +
    last_value window — the Spark merge_asof)."""
    from embulk_util_json_spark.operators.temporal import asof_join

    ev = _read(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") != "error").select(
        "user_id", "ts", "event_id", "event_type"
    )
    out = asof_join(
        left, right, ["user_id"], "ts",
        right_cols=["event_id", "event_type"], right_tiebreak="event_id",
    )
    return out.select(
        "event_id", "user_id", "ts", "ts_asof", "event_id_asof", "event_type_asof"
    )


_ORACLE_ASOF = """
    WITH u AS (
        SELECT user_id, ts, 1 AS side, event_id,
               NULL::BIGINT AS r_event_id, NULL::VARCHAR AS r_type,
               NULL::TIMESTAMP AS r_ts
        FROM events WHERE event_type = 'error'
        UNION ALL
        SELECT user_id, ts, 0, NULL, event_id, event_type, ts
        FROM events WHERE event_type <> 'error'
    ),
    c AS (
        SELECT *,
               LAST_VALUE(r_event_id IGNORE NULLS) OVER w AS event_id_asof,
               LAST_VALUE(r_type IGNORE NULLS) OVER w AS event_type_asof,
               LAST_VALUE(r_ts IGNORE NULLS) OVER w AS ts_asof
        FROM u
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts, side, r_event_id NULLS LAST
                     ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_id, user_id, ts, ts_asof, event_id_asof, event_type_asof
    FROM c WHERE side = 1
"""


def _q_windowed_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed per-conversation activity (5-min tumbling
    windows) over the parsed change stream — the batch shape of the
    watermarked streaming aggregation (streaming/windowed.py); in
    streaming the same operator runs under withWatermark with append-
    mode exactly-once window emission."""
    from embulk_util_json_spark.sources.events import (
        parse_change_events_single_pass,
    )
    from embulk_util_json_spark.streaming.windowed import windowed_activity

    changes = parse_change_events_single_pass(
        _events_as_cdc_json(spark, sf_dir)
    )
    return windowed_activity(changes, window_duration="5 minutes")


_ORACLE_WINDOWED = f"""
    WITH changes AS ({_ORACLE_CDC_EVENTS})
    SELECT
        CAST(to_timestamp(CAST(FLOOR(epoch(ts) / 300) AS BIGINT) * 300)
             AS TIMESTAMP) AS window_start,
        CAST(to_timestamp(CAST(FLOOR(epoch(ts) / 300) AS BIGINT) * 300 + 300)
             AS TIMESTAMP) AS window_end,
        conv_id,
        COUNT(*) AS n_events,
        CAST(SUM(CASE WHEN op = 'delete' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_deletes,
        MAX(turn_idx) AS max_turn
    FROM changes
    GROUP BY 1, 2, 3
"""


def _q_quality_topk_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite pipeline: exact-dedup to canonical docs, broadcast-join
    quality scores, global top-10 by (quality desc, doc_id)."""
    from embulk_util_json_spark.pipeline.dedup import exact_dup_groups
    from embulk_util_json_spark.pipeline.text import quality_score

    docs = _read(spark, sf_dir, "documents")
    canon = exact_dup_groups(docs, "text", "doc_id").filter(~F.col("is_dup"))
    q = quality_score(docs, "text", ["doc_id"])
    joined = canon.select("doc_id").join(q, "doc_id")
    return (
        joined.orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .limit(10)
        .select("doc_id", "n_chars", "n_words", "quality")
    )


def _quality_topk_unique_sql() -> str:
    from embulk_util_json_spark.pipeline.text import quality_score_sql

    q = quality_score_sql("documents", "text", ["doc_id"])
    return f"""
        WITH fp AS (
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
            FROM documents
        ),
        canon AS (
            SELECT doc_id FROM fp
            WHERE doc_id = (SELECT MIN(doc_id) FROM fp f2 WHERE f2.f = fp.f)
        ),
        q AS ({q})
        SELECT q.doc_id, q.n_chars, q.n_words, q.quality
        FROM q JOIN canon USING (doc_id)
        ORDER BY q.quality DESC, q.doc_id ASC
        LIMIT 10
    """


def _q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_util_json_spark.pipeline.text import token_stats

    return token_stats(_read(spark, sf_dir, "documents"), "text", ["doc_id"])


def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_util_json_spark.pipeline.text import quality_score

    return quality_score(_read(spark, sf_dir, "documents"), "text", ["doc_id"])


def _q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_util_json_spark.pipeline.text import lang_id

    return lang_id(_read(spark, sf_dir, "documents"), "text", ["doc_id"])


def _q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_util_json_spark.pipeline.text import fingerprint

    return fingerprint(_read(spark, sf_dir, "documents"), "text", ["doc_id"])


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_util_json_spark.pipeline.dedup import exact_dup_groups

    return exact_dup_groups(_read(spark, sf_dir, "documents"), "text", "doc_id")


def _q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_util_json_spark.pipeline.dedup import jaccard_pairs

    return jaccard_pairs(
        _read(spark, sf_dir, "documents"), "text", "doc_id",
        n=3, threshold=0.5, max_df_frac=0.05,
    )


def _q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_util_json_spark.pipeline.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _read(spark, sf_dir, "documents"), "text", "doc_id",
        n=3, num_hashes=16, bands=4, verify_threshold=0.5, max_df_frac=0.05,
    )


def _q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_util_json_spark.pipeline.dedup import simhash_pairs

    # 60-bit signature, 15-bit bands: candidate volume per band is
    # n^2 / 2^band_bits — 128x fewer candidates than 8-bit bands.
    return simhash_pairs(
        _read(spark, sf_dir, "documents"), "text", "doc_id",
        bits=60, bands=4, max_hamming=3,
    )


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash-LSH near-dup pair graph:
    every doc labeled with the min doc_id reachable through pairs
    (iterative min-label propagation; oracle = recursive CTE)."""
    from embulk_util_json_spark.pipeline.dedup import dup_clusters, minhash_lsh_pairs

    docs = _read(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id",
        n=3, num_hashes=16, bands=4, verify_threshold=0.5, max_df_frac=0.05,
    )
    return dup_clusters(docs, pairs, "doc_id")


def _q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_util_json_spark.pipeline.similarity import cosine_topk

    return cosine_topk(
        _read(spark, sf_dir, "embeddings"), "embedding", "vec_id", k=5, query_mod=50
    )


def _q_sim_cosine_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized (numpy int64 matmul) twin of sim_cosine_topk —
    bit-identical results, mapInPandas scoring with per-batch pre-top-k."""
    from embulk_util_json_spark.pipeline.similarity import cosine_topk_arrow

    return cosine_topk_arrow(
        _read(spark, sf_dir, "embeddings"), "embedding", "vec_id", k=5, query_mod=50
    )


def _q_sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_util_json_spark.pipeline.similarity import lsh_ann_topk

    return lsh_ann_topk(
        _read(spark, sf_dir, "embeddings"), "embedding", "vec_id",
        dim=64, planes=8, k=5, query_mod=50,
    )


def _q_sim_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs on the SCALE path: banded-LSH bucket equi-join
    candidate generation + exact quantized-cosine verify (never an
    all-pairs product). The oracle mirrors the banding, so the gate
    pins both engines to the same operator semantics; recall vs the
    exact pair set is itself graded (`sim_neardup_recall`)."""
    from embulk_util_json_spark.pipeline.similarity import neardup_pairs_lsh

    return neardup_pairs_lsh(
        _read(spark, sf_dir, "embeddings"), "embedding", "vec_id",
        threshold=0.35, dim=64, bits=8, bands=16,
    )


def _q_sim_neardup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs near-dup baseline (O(n²) — oracle/sample use;
    the graded default is the LSH-bucketed plan above)."""
    from embulk_util_json_spark.pipeline.similarity import neardup_pairs

    return neardup_pairs(
        _read(spark, sf_dir, "embeddings"), "embedding", "vec_id", threshold=0.35
    )


def _q_sim_neardup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the LSH-bucketed near-dup pairs against the exact
    all-pairs set — the bands/bits tuning loop (precision is 1.0 by
    construction; at threshold 0.35 — far below the c ≥ 0.9 regime the
    defaults are sized for — this measures the honest recall cost of
    skipping the O(n²) product)."""
    from embulk_util_json_spark.pipeline.similarity import (
        neardup_pairs,
        neardup_pairs_lsh,
        pair_recall,
    )

    emb = _read(spark, sf_dir, "embeddings")
    # pair_recall consumes `exact` twice (hit semi-join + denominator
    # count) and `found` once: checkpoint both so the O(n²) baseline
    # and the LSH pipeline each run exactly once
    exact = neardup_pairs(emb, "embedding", "vec_id", threshold=0.35).localCheckpoint()
    found = neardup_pairs_lsh(
        emb, "embedding", "vec_id", threshold=0.35, dim=64, bits=8, bands=16
    ).localCheckpoint()
    return pair_recall(found, exact)


def _q_sim_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_util_json_spark.pipeline.similarity import ivf_ann_topk

    return ivf_ann_topk(
        _read(spark, sf_dir, "embeddings"), "embedding", "vec_id",
        n_centroids=8, centroid_mod=61, k=5, query_mod=50,
    )


def _q_sim_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF over a TRAINED coarse quantizer: 2 Lloyd iterations on the
    integer-quantized corpus (div-exact means — both engines walk
    bit-identical centroid trajectories), then the usual cell-
    restricted exact-cosine top-k."""
    from embulk_util_json_spark.pipeline.similarity import ivf_kmeans_ann_topk

    return ivf_kmeans_ann_topk(
        _read(spark, sf_dir, "embeddings"), "embedding", "vec_id",
        n_centroids=8, centroid_mod=61, iters=2, k=5, query_mod=50, nprobe=1,
    )


def _q_sim_ivf_ann_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with nprobe=2: each query probes its two nearest cells
    — the recall knob turned one notch (candidates ∝ nprobe)."""
    from embulk_util_json_spark.pipeline.similarity import ivf_ann_topk

    return ivf_ann_topk(
        _read(spark, sf_dir, "embeddings"), "embedding", "vec_id",
        n_centroids=8, centroid_mod=61, k=5, query_mod=50, nprobe=2,
    )


def _q_sim_lsh_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN with flip-one-bit multi-probe: P+1 buckets per query
    instead of 1, no index growth — the LSH recall knob."""
    from embulk_util_json_spark.pipeline.similarity import lsh_ann_topk

    return lsh_ann_topk(
        _read(spark, sf_dir, "embeddings"), "embedding", "vec_id",
        dim=64, planes=8, k=5, query_mod=50, multiprobe=1,
    )


def _q_sim_ann_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-recall@5 of every ANN variant against the exact top-k —
    the knob-tuning table: multiprobe must beat plain LSH, nprobe=2
    must beat nprobe=1 (asserted in pytest; values graded here)."""
    from pyspark.sql import functions as F

    from embulk_util_json_spark.pipeline.similarity import (
        cosine_topk,
        ivf_ann_topk,
        lsh_ann_topk,
        recall_summary,
    )

    emb = _read(spark, sf_dir, "embeddings")
    # the exact top-k feeds ALL four variant joins: checkpoint it so
    # the brute-force score-reduce runs once, not once per variant
    exact = cosine_topk(emb, "embedding", "vec_id", k=5, query_mod=50).localCheckpoint()
    variants = {
        "ivf_np1": ivf_ann_topk(
            emb, "embedding", "vec_id",
            n_centroids=8, centroid_mod=61, k=5, query_mod=50, nprobe=1,
        ),
        "ivf_np2": ivf_ann_topk(
            emb, "embedding", "vec_id",
            n_centroids=8, centroid_mod=61, k=5, query_mod=50, nprobe=2,
        ),
        "lsh_p8": lsh_ann_topk(
            emb, "embedding", "vec_id", dim=64, planes=8, k=5, query_mod=50
        ),
        "lsh_p8_mp1": lsh_ann_topk(
            emb, "embedding", "vec_id",
            dim=64, planes=8, k=5, query_mod=50, multiprobe=1,
        ),
    }
    out = None
    for name, ann in variants.items():
        row = recall_summary(ann, exact, k=5).select(
            F.lit(name).alias("variant"), "n_exact", "n_hits", "recall"
        )
        out = row if out is None else out.unionByName(row)
    return out


def _q_sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the LSH ANN against the exact brute-force top-k —
    the tuning loop for the ANN knobs (raise planes until recall
    clears target, then drop the exact pass)."""
    from embulk_util_json_spark.pipeline.similarity import (
        ann_recall,
        cosine_topk,
        lsh_ann_topk,
    )

    emb = _read(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, "embedding", "vec_id", k=5, query_mod=50)
    ann = lsh_ann_topk(
        emb, "embedding", "vec_id", dim=64, planes=8, k=5, query_mod=50
    )
    return ann_recall(ann, exact, k=5)


def _q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_util_json_spark.pipeline.multimodal import attach_media, byte_features

    media = attach_media(_read(spark, sf_dir, "documents"), "text", "doc_id")
    return byte_features(media)


def _q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over opaque binary payloads: the
    1-to-N Arrow expansion plumbing (mapInPandas rows out > rows in)
    with deterministic byte-chunk frames in place of a codec."""
    from embulk_util_json_spark.pipeline.multimodal import (
        attach_media,
        frame_sample,
    )

    media = attach_media(_read(spark, sf_dir, "documents"), "text", "doc_id")
    return frame_sample(media, frame_bytes=64, every_n=2)



def _q_table_stats_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE distribution stats: exact distributed quantiles
    (``pipeline/stats.numeric_quantiles`` — Spark's exact
    ``percentile``, the SQL-standard PERCENTILE_CONT interpolation)
    over the numeric measure columns of ``lineitem``, one full-scan
    hash aggregation for all (column, prob) cells. The DuckDB twin is
    ``quantile_cont`` — identical rank interpolation, so the doubles
    match bit-for-bit on identical input. At 100 TB the documented
    knob is ``exact=False`` (``percentile_approx``, bounded-memory
    sketch, same plan)."""
    from embulk_util_json_spark.pipeline.stats import numeric_quantiles

    li = _read(spark, sf_dir, "lineitem")
    return numeric_quantiles(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


def _table_stats_quantiles_sql() -> str:
    from embulk_util_json_spark.pipeline.stats import numeric_quantiles_sql

    return numeric_quantiles_sql(
        "SELECT * FROM lineitem",
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


def _pipeline_oracles() -> dict[str, str]:
    from embulk_util_json_spark.pipeline import (
        dedup,
        multimodal,
        pii,
        similarity,
        text,
        transcripts,
    )

    _EXACT_TOPK_SQL = similarity.cosine_topk_sql(
        "embeddings", "embedding", "vec_id", k=5, query_mod=50
    )

    return {
        "text_top_ngrams": dedup.top_ngrams_sql(
            "documents", "text", "doc_id", n=3, k=20
        ),
        "transcript_assemble": transcripts.assemble_conversations_sql(
            _ORACLE_CDC_FINAL
        ),
        "transcript_view_incremental": transcripts.assemble_conversations_sql(
            _ORACLE_CDC_FINAL
        ),
        "transcript_stats": transcripts.conversation_stats_sql(_ORACLE_CDC_FINAL),
        "transcript_truncate_budget": transcripts.truncate_to_budget_sql(
            _ORACLE_CDC_FINAL, budget=120
        ),
        "transcript_role_violations": transcripts.role_alternation_violations_sql(
            _ORACLE_CDC_FINAL
        ),
        "transcript_merge_roles": transcripts.merge_consecutive_roles_sql(
            _ORACLE_CDC_FINAL
        ),
        "pii_counts": pii.pii_counts_sql(_PII_DOCS_SQL, "text", "doc_id"),
        "pii_redact": pii.redact_pii_sql(_PII_DOCS_SQL, "text", "doc_id"),
        "text_repetition": dedup.repetition_stats_sql(
            "documents", "text", "doc_id", n=3
        ),
        "contamination": dedup.benchmark_contamination_sql(
            "documents",
            "(SELECT * FROM documents WHERE doc_id < 20)",
            "text",
            "doc_id",
            n=3,
        ),
        "text_token_stats": text.token_stats_sql("documents", "text", ["doc_id"]),
        "text_quality": text.quality_score_sql("documents", "text", ["doc_id"]),
        "text_lang_id": text.lang_id_sql("documents", "text", ["doc_id"]),
        "text_fingerprint": text.fingerprint_sql("documents", "text", ["doc_id"]),
        "dedup_exact": dedup.exact_dup_groups_sql("documents", "text", "doc_id"),
        "dedup_jaccard_pairs": dedup.jaccard_pairs_sql(
            "documents", "text", "doc_id", n=3, threshold=0.5, max_df_frac=0.05
        ),
        "dedup_minhash_lsh": dedup.minhash_lsh_pairs_sql(
            "documents", "text", "doc_id",
            n=3, num_hashes=16, bands=4, verify_threshold=0.5, max_df_frac=0.05,
        ),
        "dedup_simhash_pairs": dedup.simhash_pairs_sql(
            "documents", "text", "doc_id", bits=60, bands=4, max_hamming=3
        ),
        "dedup_clusters": dedup.dup_clusters_sql(
            "documents", "doc_id",
            dedup.minhash_lsh_pairs_sql(
                "documents", "text", "doc_id",
                n=3, num_hashes=16, bands=4, verify_threshold=0.5, max_df_frac=0.05,
            ),
        ),
        "sim_cosine_topk": similarity.cosine_topk_sql(
            "embeddings", "embedding", "vec_id", k=5, query_mod=50
        ),
        "sim_cosine_topk_arrow": similarity.cosine_topk_sql(
            "embeddings", "embedding", "vec_id", k=5, query_mod=50
        ),
        "sim_lsh_ann_topk": similarity.lsh_ann_topk_sql(
            "embeddings", "embedding", "vec_id", dim=64, planes=8, k=5, query_mod=50
        ),
        "sim_ivf_ann_topk": similarity.ivf_ann_topk_sql(
            "embeddings", "embedding", "vec_id",
            n_centroids=8, centroid_mod=61, k=5, query_mod=50,
        ),
        "sim_ivf_ann_nprobe2": similarity.ivf_ann_topk_sql(
            "embeddings", "embedding", "vec_id",
            n_centroids=8, centroid_mod=61, k=5, query_mod=50, nprobe=2,
        ),
        "sim_ivf_kmeans_topk": similarity.ivf_kmeans_ann_topk_sql(
            "embeddings", "embedding", "vec_id",
            n_centroids=8, centroid_mod=61, iters=2, k=5, query_mod=50,
        ),
        "sim_lsh_ann_multiprobe": similarity.lsh_ann_topk_sql(
            "embeddings", "embedding", "vec_id",
            dim=64, planes=8, k=5, query_mod=50, multiprobe=1,
        ),
        "sim_ann_recall_curve": " UNION ALL ".join(
            f"SELECT '{name}' AS variant, * FROM ({similarity.recall_summary_sql(ann_sql, _EXACT_TOPK_SQL, k=5)})"
            for name, ann_sql in [
                (
                    "ivf_np1",
                    similarity.ivf_ann_topk_sql(
                        "embeddings", "embedding", "vec_id",
                        n_centroids=8, centroid_mod=61, k=5, query_mod=50,
                        nprobe=1,
                    ),
                ),
                (
                    "ivf_np2",
                    similarity.ivf_ann_topk_sql(
                        "embeddings", "embedding", "vec_id",
                        n_centroids=8, centroid_mod=61, k=5, query_mod=50,
                        nprobe=2,
                    ),
                ),
                (
                    "lsh_p8",
                    similarity.lsh_ann_topk_sql(
                        "embeddings", "embedding", "vec_id",
                        dim=64, planes=8, k=5, query_mod=50,
                    ),
                ),
                (
                    "lsh_p8_mp1",
                    similarity.lsh_ann_topk_sql(
                        "embeddings", "embedding", "vec_id",
                        dim=64, planes=8, k=5, query_mod=50, multiprobe=1,
                    ),
                ),
            ]
        ),
        "sim_ann_recall": similarity.ann_recall_sql(
            similarity.lsh_ann_topk_sql(
                "embeddings", "embedding", "vec_id",
                dim=64, planes=8, k=5, query_mod=50,
            ),
            similarity.cosine_topk_sql(
                "embeddings", "embedding", "vec_id", k=5, query_mod=50
            ),
            k=5,
        ),
        "sim_neardup_pairs": similarity.neardup_pairs_lsh_sql(
            "embeddings", "embedding", "vec_id",
            threshold=0.35, dim=64, bits=8, bands=16,
        ),
        "sim_neardup_pairs_exact": similarity.neardup_pairs_sql(
            "embeddings", "embedding", "vec_id", threshold=0.35
        ),
        "sim_neardup_recall": similarity.pair_recall_sql(
            similarity.neardup_pairs_lsh_sql(
                "embeddings", "embedding", "vec_id",
                threshold=0.35, dim=64, bits=8, bands=16,
            ),
            similarity.neardup_pairs_sql(
                "embeddings", "embedding", "vec_id", threshold=0.35
            ),
        ),
        "multimodal_frame_sample": multimodal.frame_sample_sql(
            "documents", "text", "doc_id", frame_bytes=64, every_n=2
        ),
        "multimodal_byte_features": multimodal.byte_features_sql(
            "documents", "text", "doc_id"
        ),
    }


__all__ = [
    "_q_transcript_view_incremental",
    "_q_transcript_assemble",
    "_q_transcript_truncate_budget",
    "_q_transcript_stats",
    "_q_transcript_role_violations",
    "_pii_docs",
    "_PII_DOCS_SQL",
    "_q_transcript_merge_roles",
    "_dq_rules",
    "_q_dq_summary",
    "_q_dq_violations",
    "_dq_oracles",
    "_q_dedup_incremental",
    "_ORACLE_DEDUP_INCREMENTAL",
    "_q_text_top_ngrams",
    "_q_sample_docs",
    "_q_split_assign",
    "_sampling_oracles",
    "_q_pack_sequences",
    "_pack_sequences_oracle",
    "_q_export_training_set",
    "_export_training_sql",
    "_q_pii_counts",
    "_q_pii_redact",
    "_q_text_repetition",
    "_q_contamination",
    "_q_events_sessionize",
    "_ORACLE_SESSIONIZE",
    "_q_events_sessionize_native",
    "_q_events_asof_join",
    "_ORACLE_ASOF",
    "_q_windowed_activity",
    "_ORACLE_WINDOWED",
    "_q_quality_topk_unique",
    "_quality_topk_unique_sql",
    "_q_text_token_stats",
    "_q_text_quality",
    "_q_text_lang_id",
    "_q_text_fingerprint",
    "_q_dedup_exact",
    "_q_dedup_jaccard",
    "_q_dedup_minhash_lsh",
    "_q_dedup_simhash",
    "_q_dedup_clusters",
    "_q_sim_cosine_topk",
    "_q_sim_cosine_topk_arrow",
    "_q_sim_lsh_ann",
    "_q_sim_neardup",
    "_q_sim_neardup_exact",
    "_q_sim_neardup_recall",
    "_q_sim_ivf_ann",
    "_q_sim_ivf_kmeans_topk",
    "_q_sim_ivf_ann_nprobe2",
    "_q_sim_lsh_ann_multiprobe",
    "_q_sim_ann_recall_curve",
    "_q_sim_ann_recall",
    "_q_multimodal_features",
    "_q_multimodal_frames",
    "_pipeline_oracles",
    "_q_table_stats_quantiles",
    "_table_stats_quantiles_sql",
]
