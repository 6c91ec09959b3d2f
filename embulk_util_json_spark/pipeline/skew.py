"""Skew diagnostics: hot-key detection and salt planning.

north_star: "salted key-partitioned apply to defeat hot-conversation
skew". The salted LWW (``operators/lww.lww_salted``) and the sink's
salted apply take a salt factor as INPUT — this module derives it
from the data, so the knob is measured, not guessed:

- ``key_histogram``: the top-k hottest keys with exact counts, share
  of the stream, and the per-key salt factor ``ceil(cnt · P / total)``
  — how many of the stage's P partitions that key's rows deserve. A
  key with salt 1 is harmless; salt s > 1 means one reducer would
  receive s partitions' worth of rows without salting.
- ``skew_summary``: one row of stream-level shape (rows, keys,
  max/avg per key, the hot ratio) — the cheap per-batch health metric.
- ``recommended_salt_buckets``: the driver-side scalar feeding
  ``lww_salted(salt_buckets=…)`` — max per-key salt, floored at 1.

Plan shape at 100 TB: ONE hash aggregation over the keys (map-side
partial combine pre-reduces hot keys per input partition — the same
property that makes ``lww_agg`` skew-tolerant), then only key-count
rows flow on: the total is a 1-row agg over the grouped frame (same
exchange, reused), the top-k is TakeOrdered (no global sort), and the
summary is metadata-sized. Nothing rescans the input.

Exactness for the oracle twin: counts are exact longs; ``share`` is a
single double division of exact integers (< 2^53 → correctly rounded
identically in Spark and DuckDB); ``salt`` uses INTEGER arithmetic
``(cnt·P + total − 1) div total`` so no float appears. Top-k ties are
broken by the key itself (row_number over (count desc, key)) so
membership is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _key_counts(df: DataFrame, keys: list[str]) -> DataFrame:
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))


def _with_total(counts: DataFrame) -> DataFrame:
    total = counts.agg(
        F.sum("n_rows").alias("_total"), F.count(F.lit(1)).alias("_n_keys")
    )
    # 1-row broadcast product; the grouped subtree is shared with the
    # counts side, so Catalyst reuses the exchange instead of rescanning
    return counts.crossJoin(F.broadcast(total))


def key_histogram(
    df: DataFrame, keys: list[str], top_k: int = 20, parallelism: int = 32
) -> DataFrame:
    """Top-``top_k`` hottest keys: exact count, share of the stream,
    and the per-key salt factor for a ``parallelism``-partition stage."""
    c = _with_total(_key_counts(df, keys))
    salt = F.expr(f"div(n_rows * {int(parallelism)} + _total - 1, _total)")
    order = [F.col("n_rows").desc(), *[F.col(k) for k in keys]]
    # Top-k FIRST via orderBy+limit — Spark plans this as
    # TakeOrderedAndProject (per-partition heap + driver merge of k
    # rows), never a single-task global sort over the per-key count
    # frame (one row per distinct key = billions at 100 TB). Only the
    # ≤ top_k surviving rows pass through the ranking window, so the
    # unpartitioned row_number is metadata-sized by construction.
    top = (
        c.select(
            *keys,
            "n_rows",
            (F.col("n_rows") / F.col("_total")).alias("share"),
            F.greatest(salt, F.lit(1)).cast("long").alias("salt"),
        )
        .orderBy(*order)
        .limit(int(top_k))
    )
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w))


def key_histogram_sql(changes_sql: str, keys: list[str], top_k: int = 20,
                      parallelism: int = 32) -> str:
    """DuckDB oracle twin of ``key_histogram`` over a changes CTE."""
    key_cols = ", ".join(keys)
    order = ", ".join([f"n_rows DESC"] + keys)
    return f"""
        WITH changes AS ({changes_sql}),
        counts AS (
            SELECT {key_cols}, COUNT(*) AS n_rows
            FROM changes GROUP BY {key_cols}
        ),
        t AS (SELECT SUM(n_rows) AS _total FROM counts),
        ranked AS (
            SELECT {key_cols}, n_rows,
                   CAST(n_rows AS DOUBLE) / _total AS share,
                   -- CAST: _total is a DuckDB SUM (HUGEINT), which
                   -- infects the integer arithmetic; Spark emits int64.
                   CAST(GREATEST(
                       (n_rows * {int(parallelism)} + _total - 1) // _total,
                       1
                   ) AS BIGINT) AS salt,
                   ROW_NUMBER() OVER (ORDER BY {order}) AS rank
            FROM counts, t
        )
        SELECT * FROM ranked WHERE rank <= {int(top_k)}
    """


def skew_summary(df: DataFrame, keys: list[str]) -> DataFrame:
    """One row: stream shape for the per-batch skew health metric.
    ``hot_ratio`` = max-key count / mean-key count — >> 1 means one
    reducer would take hot_ratio× the average partition's work."""
    counts = _key_counts(df, keys)
    return counts.agg(
        F.sum("n_rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n_rows").alias("max_key_rows"),
        (F.sum("n_rows") / F.count(F.lit(1))).alias("avg_key_rows"),
        (F.max("n_rows") * F.count(F.lit(1)) / F.sum("n_rows")).alias("hot_ratio"),
    )


def skew_summary_sql(changes_sql: str, keys: list[str]) -> str:
    key_cols = ", ".join(keys)
    return f"""
        WITH changes AS ({changes_sql}),
        counts AS (
            SELECT {key_cols}, COUNT(*) AS n_rows
            FROM changes GROUP BY {key_cols}
        )
        SELECT CAST(SUM(n_rows) AS BIGINT) AS n_rows,
               COUNT(*) AS n_keys,
               MAX(n_rows) AS max_key_rows,
               CAST(SUM(n_rows) AS DOUBLE) / COUNT(*) AS avg_key_rows,
               CAST(MAX(n_rows) AS DOUBLE) * COUNT(*) / SUM(n_rows) AS hot_ratio
        FROM counts
    """


def recommended_salt_buckets(
    df: DataFrame, keys: list[str], parallelism: int = 32
) -> int:
    """Driver-side scalar for ``lww_salted(salt_buckets=…)``: the max
    per-key salt factor (1 when the stream is uniform — i.e. salting
    off). One metadata-sized collect of a 1-row aggregate."""
    c = _with_total(_key_counts(df, keys))
    row = c.agg(
        F.max(
            F.expr(f"div(n_rows * {int(parallelism)} + _total - 1, _total)")
        ).alias("s")
    ).collect()[0]
    return max(1, int(row.s or 1))
