"""Transcript-native operators over the replayed conversations table
``(conv_id, turn_idx, role, text, tool, ts)`` — the payload this
engine ingests (BASELINE.json input_hint). These are the ops a
training-data pipeline runs *after* CDC replay materializes the
table: assemble documents, score conversations, validate structure.

All pure Catalyst: one hash shuffle on ``conv_id`` per operator (the
same key the sink buckets by, so on a bucketed read Spark can elide
the exchange), codegen'd string/window expressions, no Python.

Determinism: every per-conversation aggregate orders by
``(turn_idx)`` — the stable turn ordering the north rule pins
(BASELINE.json: "per-turn text equality under stable turn ordering").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

ROLE_TAG_SEP = ": "
TURN_SEP = "\n"


def assemble_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """One document per conversation: turns sorted by ``turn_idx``,
    rendered ``role: text`` and joined with newlines — the standard
    transcript→document flattening before text-level pipeline ops.

    Plan: ``sort_array(collect_list(struct(turn_idx, line)))`` — ONE
    partial-aggregating shuffle; the sort is per-group over the
    collected array (conversations are short — bounded by turn count,
    not corpus size), not a global sort.

    NULL semantics are PINNED on both engine and oracle: a NULL role
    or text renders as the empty string (``coalesce``), so the line
    always appears. Without the pin, Spark's ``concat_ws`` silently
    skips NULL args while the SQL ``||`` nulls the whole line and
    ``string_agg`` drops it — the engines would diverge on any
    conversation containing a NULL turn."""
    line = F.concat(
        F.coalesce(F.col(role_col), F.lit("")),
        F.lit(ROLE_TAG_SEP),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    assembled = (
        df.groupBy(conv_col)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col(turn_col), line.alias("l")))
                    ),
                    lambda s: s["l"],
                ),
                TURN_SEP,
            ).alias("document"),
            F.count(F.lit(1)).cast("int").alias("n_turns"),
        )
    )
    return assembled


def conversation_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-conversation structure metrics: turn count, distinct roles,
    tool-call rate, total/mean text length, turn-index span — the
    conversation-level quality signal (filter malformed or truncated
    conversations before training)."""
    return df.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_turns"),
        F.countDistinct(role_col).cast("int").alias("n_roles"),
        F.sum(F.when(F.col(tool_col).isNotNull(), 1).otherwise(0))
        .cast("int")
        .alias("n_tool_calls"),
        F.sum(F.length(text_col)).cast("long").alias("total_chars"),
        F.min(turn_col).cast("int").alias("first_turn"),
        F.max(turn_col).cast("int").alias("last_turn"),
        # contiguity: span+1 == n_turns ⇔ no missing turn indices
        # (duplicate turn_idx cannot survive the keyed LWW upsert)
        (
            (F.max(turn_col) - F.min(turn_col) + 1)
            == F.count(F.lit(1))
        ).alias("contiguous"),
    )


def role_alternation_violations(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
) -> DataFrame:
    """Turns whose role equals the previous turn's role (per
    conversation, turn order) — the structural lint for chat-format
    training data (two consecutive same-role turns usually mean a
    merge/split bug upstream). One window shuffle on ``conv_id``."""
    w = Window.partitionBy(conv_col).orderBy(F.col(turn_col).asc())
    prev = F.lag(F.col(role_col)).over(w)
    return (
        df.select(
            F.col(conv_col),
            F.col(turn_col),
            F.col(role_col),
            prev.alias("prev_role"),
        )
        .filter(F.col("prev_role").isNotNull() & (F.col("prev_role") == F.col(role_col)))
    )


def merge_consecutive_roles(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Repair transform for the alternation lint: runs of consecutive
    same-role turns collapse into one turn — texts joined with a
    newline in turn order, the run's first turn_idx kept, turn indices
    re-densified (0..n-1) afterwards. The standard chat-format
    normalization before training.

    Same plan shape as gap sessionization: lag marks run starts,
    cumulative sum assigns run ids (one window shuffle on the
    conversation key), then one aggregation per run. NULL texts join
    as empty strings (same pin as :func:`assemble_conversations` — the
    SQL twin's ``string_agg`` would otherwise drop the NULL element
    while ``array_join`` keeps it)."""
    w = Window.partitionBy(conv_col).orderBy(F.col(turn_col).asc())
    starts = F.when(
        F.lag(F.col(role_col)).over(w).isNull()
        | (F.lag(F.col(role_col)).over(w) != F.col(role_col)),
        1,
    ).otherwise(0)
    runs = df.withColumn(
        "_run",
        F.sum(starts).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    merged = runs.groupBy(conv_col, "_run").agg(
        # constant within a run for well-formed input; min (not first)
        # so a degenerate NULL-role row merged into a run resolves
        # deterministically and identically to the SQL twin's MIN
        F.min(role_col).alias(role_col),
        F.min(turn_col).alias("_first_turn"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col(turn_col),
                            F.coalesce(F.col(text_col), F.lit("")).alias("t"),
                        )
                    )
                ),
                lambda s: s["t"],
            ),
            TURN_SEP,
        ).alias(text_col),
        F.count(F.lit(1)).cast("int").alias("n_merged"),
    )
    return merged.select(
        F.col(conv_col),
        (F.col("_run") - 1).cast("int").alias(turn_col),  # densified 0-based
        role_col,
        text_col,
        "n_merged",
        F.col("_first_turn").cast("int").alias("orig_turn_idx"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins (generated from the same constants)
# ---------------------------------------------------------------------------


def truncate_to_budget(
    df: DataFrame,
    budget: int,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Context-window truncation: keep each conversation's LATEST
    turns whose cumulative token count fits ``budget`` — the standard
    chat-training preprocessing step (recent context matters most;
    oldest turns drop first).

    Token counts use the same BPE-ish pre-tokenizer regex as
    ``text.token_stats``; a NULL text counts 0 (``coalesce`` — Spark's
    ``size(NULL)`` is -1, which would corrupt the running sum). The
    cumulative sum runs from the LAST turn backwards (window ordered
    ``turn_idx DESC``), and a turn survives iff the running total
    *including itself* is within budget — so a final turn that alone
    exceeds the budget empties the conversation rather than
    overflowing it (pinned on both engines).

    Scale shape: ONE conv_id shuffle; the per-group sort is bounded by
    turn count, never corpus size — same as every transcript op here.

    Output: input columns + ``n_tokens`` (per turn, int) and
    ``cum_tokens`` (running total from the end, long)."""
    from .text import TOKEN_RE

    nt = F.size(
        F.regexp_extract_all(
            F.coalesce(F.col(text_col), F.lit("")), F.lit(TOKEN_RE), 0
        )
    )
    w = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(turn_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("n_tokens", nt)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= F.lit(int(budget)))
    )


def truncate_to_budget_sql(table_sql: str, budget: int) -> str:
    """DuckDB oracle twin of :func:`truncate_to_budget` (output
    narrowed to the graded columns)."""
    from .text import TOKEN_RE

    return f"""
        SELECT conv_id, turn_idx, role, text, n_tokens, cum_tokens
        FROM (
            SELECT conv_id, turn_idx, role, text, n_tokens,
                   -- CAST: DuckDB window SUM -> HUGEINT, Spark -> int64.
                   CAST(SUM(n_tokens) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_tokens
            FROM (
                SELECT conv_id, turn_idx, role, text,
                       CAST(len(regexp_extract_all(
                           COALESCE(text, ''), '{TOKEN_RE}')) AS INTEGER)
                           AS n_tokens
                FROM ({table_sql})
            )
        )
        WHERE cum_tokens <= {int(budget)}
    """


def assemble_conversations_sql(table_sql: str) -> str:
    """``table_sql``: a query producing (conv_id, turn_idx, role, text)."""
    return f"""
        SELECT conv_id,
               string_agg(coalesce(role, '') || '{ROLE_TAG_SEP}'
                          || coalesce(text, ''), '{TURN_SEP}'
                          ORDER BY turn_idx) AS document,
               CAST(COUNT(*) AS INTEGER) AS n_turns
        FROM ({table_sql})
        GROUP BY conv_id
    """


def conversation_stats_sql(table_sql: str) -> str:
    return f"""
        SELECT conv_id,
               CAST(COUNT(*) AS INTEGER) AS n_turns,
               CAST(COUNT(DISTINCT role) AS INTEGER) AS n_roles,
               CAST(SUM(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END)
                    AS INTEGER) AS n_tool_calls,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars,
               CAST(MIN(turn_idx) AS INTEGER) AS first_turn,
               CAST(MAX(turn_idx) AS INTEGER) AS last_turn,
               (MAX(turn_idx) - MIN(turn_idx) + 1) = COUNT(*) AS contiguous
        FROM ({table_sql})
        GROUP BY conv_id
    """


def merge_consecutive_roles_sql(table_sql: str) -> str:
    return f"""
        WITH runs AS (
            SELECT conv_id, turn_idx, role, text,
                   SUM(CASE WHEN prev_role IS NULL OR prev_role <> role
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS UNBOUNDED PRECEDING) AS run
            FROM (
                SELECT *, LAG(role) OVER (
                    PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
                FROM ({table_sql})
            )
        )
        SELECT conv_id,
               CAST(run - 1 AS INTEGER) AS turn_idx,
               MIN(role) AS role,
               string_agg(coalesce(text, ''), '{TURN_SEP}'
                          ORDER BY turn_idx) AS text,
               CAST(COUNT(*) AS INTEGER) AS n_merged,
               CAST(MIN(turn_idx) AS INTEGER) AS orig_turn_idx
        FROM runs
        GROUP BY conv_id, run
    """


def role_alternation_violations_sql(table_sql: str) -> str:
    return f"""
        SELECT conv_id, turn_idx, role, prev_role FROM (
            SELECT conv_id, turn_idx, role,
                   LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                       AS prev_role
            FROM ({table_sql})
        ) WHERE prev_role IS NOT NULL AND prev_role = role
    """
