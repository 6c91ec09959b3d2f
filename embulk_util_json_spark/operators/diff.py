"""Keyed table diff — the CDC validation/repair primitive.

After a replay (or a migration between sinks/engines), the operator
answers "is the target bit-equal to the reference, and if not, where":
one full-outer join on the key, null-safe struct comparison of the
payload, a status per key. This is the distributed form of the
per-turn text-equality invariant the engine's tests assert
(north-star: final table state must reproduce the reference's).

Scale: ONE shuffle each side keyed by the join key (co-partitioned);
the payload comparison is a codegen'd null-safe struct equality, and
the summary is a map-side-combined count per status. No driver-side
row movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STATUS_COL = "diff_status"


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key diff: (keys..., diff_status) with status one of
    ``only_left`` / ``only_right`` / ``mismatch`` / ``equal``.

    ``compare_cols`` defaults to the non-key columns both sides share
    (order-normalized), compared null-safely (NULL == NULL)."""
    if compare_cols is None:
        compare_cols = sorted(
            (set(left.columns) & set(right.columns)) - set(keys)
        )

    def side(df: DataFrame, tag: str) -> DataFrame:
        # no shared payload columns -> presence-only diff (constant
        # payload: keys present on both sides compare 'equal')
        payload = (
            F.struct(*[F.col(c).alias(c) for c in compare_cols])
            if compare_cols
            else F.lit(0)
        )
        return df.select(
            *keys,
            payload.alias(f"_p_{tag}"),
            F.lit(1).alias(f"_in_{tag}"),
        )

    joined = side(left, "l").join(side(right, "r"), keys, "full_outer")
    status = (
        F.when(F.col("_in_r").isNull(), F.lit("only_left"))
        .when(F.col("_in_l").isNull(), F.lit("only_right"))
        .when(F.col("_p_l").eqNullSafe(F.col("_p_r")), F.lit("equal"))
        .otherwise(F.lit("mismatch"))
    )
    return joined.select(*keys, status.alias(STATUS_COL))


def table_diff_summary(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(diff_status, n) counts — the replay-equality checksum."""
    return (
        table_diff(left, right, keys, compare_cols)
        .groupBy(STATUS_COL)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def table_diff_summary_sql(
    left_sql: str, right_sql: str, keys: list[str], compare_cols: list[str]
) -> str:
    """DuckDB twin of ``table_diff_summary`` over two relations."""
    ks = ", ".join(keys)
    on = " AND ".join(f"l.{k} = r.{k}" for k in keys)
    eq = " AND ".join(
        f"(l.{c} = r.{c} OR (l.{c} IS NULL AND r.{c} IS NULL))"
        for c in compare_cols
    )
    l_key = keys[0]
    return f"""
    WITH _l AS ({left_sql}), _r AS ({right_sql}),
    _j AS (
        SELECT CASE
            WHEN r.{l_key} IS NULL AND r._one IS NULL THEN 'only_left'
            WHEN l.{l_key} IS NULL AND l._one IS NULL THEN 'only_right'
            WHEN {eq} THEN 'equal'
            ELSE 'mismatch'
        END AS diff_status
        FROM (SELECT *, 1 AS _one FROM _l) l
        FULL OUTER JOIN (SELECT *, 1 AS _one FROM _r) r ON {on}
    )
    SELECT diff_status, COUNT(*) AS n FROM _j GROUP BY diff_status
    """
