"""Sequence packing: assign documents to fixed-token-budget bins
(context-window fill for training) — deterministic and distributed.

True globally-greedy packing is sequential (bin N+1 depends on every
earlier doc), which at scale means a single-partition window — the
classic scale trap. The distributed formulation packs WITHIN id-range
groups: documents are range-grouped by id (``group = id div
group_size``), each group packs independently with a running-sum
window partitioned by group, and the bin key is (group, local_bin).
Each group's packing is exactly the greedy contiguous fill over its
id-ordered docs, groups pack in parallel, and the assignment is a
pure function of (id, token count) — reproducible anywhere.

Packing policy is concat-then-chunk (the GPT-style pretraining
shape): a document's bin is the budget-window containing its START
offset in the group's concatenated id-ordered token stream, so a
document straddling a window boundary belongs to the window it
starts in (downstream chunking splits or truncates it), and a
document larger than the budget simply spans windows. The per-group
boundary waste vs. one global stream is at most one window per
group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    group_size: int = 100_000,
) -> DataFrame:
    """(id, tokens) → (id, tokens, pack_group, pack_bin, bin_id):
    contiguous greedy fill per id-range group. ``bin_id`` is the
    stable string key ``group:local_bin``."""
    # exact integer division (double `/` loses exactness past 2^53;
    # the SQL twin's `//` is exact, so the Spark side must match)
    gid = F.col(id_col)
    group = (
        (gid - F.pmod(gid, F.lit(group_size))).cast("decimal(38,0)")
        / F.lit(group_size)
    ).cast("long")
    w = (
        Window.partitionBy(group)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(token_col)).over(w)
    local_bin = F.floor(
        (running - F.col(token_col)) / F.lit(budget)
    ).cast("long")
    return df.select(
        F.col(id_col),
        F.col(token_col),
        group.alias("pack_group"),
        local_bin.alias("pack_bin"),
        F.concat_ws(
            ":", group.cast("string"), local_bin.cast("string")
        ).alias("bin_id"),
    )


def pack_sequences_sql(
    table: str, id_col: str, token_expr: str, budget: int,
    group_size: int = 100_000,
) -> str:
    """DuckDB twin; ``token_expr`` is the SQL expression for the token
    count over ``table``'s columns."""
    return f"""
        WITH t AS (
            SELECT {id_col}, {token_expr} AS tokens,
                   CAST({id_col} // {group_size} AS BIGINT) AS pack_group
            FROM {table}
        ),
        r AS (
            SELECT {id_col}, tokens, pack_group,
                   SUM(tokens) OVER (
                       PARTITION BY pack_group ORDER BY {id_col}
                       ROWS UNBOUNDED PRECEDING
                   ) AS running
            FROM t
        )
        SELECT {id_col}, CAST(tokens AS INTEGER) AS tokens, pack_group,
               CAST(FLOOR((running - tokens) / {budget}) AS BIGINT)
                   AS pack_bin,
               CAST(pack_group AS VARCHAR) || ':' ||
                   CAST(CAST(FLOOR((running - tokens) / {budget}) AS BIGINT)
                        AS VARCHAR) AS bin_id
        FROM r
    """
