"""Declarative data-quality gates over ingested tables.

A training-data pipeline promotes a CDC-ingested table only when its
constraints hold (null-free keys, domain-valid enums, text sanity).
Rules are named boolean Columns (True = row satisfies the rule;
NULL counts as a violation, the SQL ``IS NOT TRUE`` convention), so
everything stays JVM-side codegen — one scan for the whole rule set.

``dq_summary`` — one row per rule with violation counts (single
aggregate over one scan: rules never cost a pass each).
``dq_violations`` — the failing rows with the list of rules each row
fails (for quarantine/debugging; same one-scan shape).

Each has a generated DuckDB-SQL twin (the ``*_sql`` functions) built
from the same rule SQL, keeping the oracle and the Spark plan
mechanically in sync — the pattern used across ``pipeline/``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _violation(col: Column) -> Column:
    # pred IS NOT TRUE: false OR null -> violation
    return F.when(col, 0).otherwise(1)


def dq_summary(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row per rule: (rule, n_rows, n_violations, violation_frac).

    Single hash-aggregate over a single scan regardless of rule count;
    the per-rule expansion is a driver-side stack over the 1-row
    aggregate (no second job, no shuffle of data rows).
    """
    if not rules:
        raise ValueError("dq_summary requires at least one rule")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, col in rules.items():
        aggs.append(F.sum(_violation(col)).alias(f"_v_{name}"))
    row = df.agg(*aggs)
    pairs = ", ".join(f"'{name}', _v_{name}" for name in rules)
    return row.select(
        F.expr(f"stack({len(rules)}, {pairs}) AS (rule, n_violations)"),
        F.col("_n").alias("n_rows"),
    ).select(
        "rule",
        "n_rows",
        "n_violations",
        F.round(F.col("n_violations") / F.col("n_rows"), 6).alias(
            "violation_frac"
        ),
    )


def dq_summary_sql(relation_sql: str, rules_sql: dict[str, str]) -> str:
    """DuckDB oracle for ``dq_summary`` from the same rule predicates."""
    branches = "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS rule,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN ({pred}) THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_violations
        FROM _dq_t"""
        for name, pred in rules_sql.items()
    )
    return f"""
    WITH _dq_t AS ({relation_sql}),
    _dq_s AS ({branches})
    SELECT rule, n_rows, n_violations,
           ROUND(n_violations / n_rows, 6) AS violation_frac
    FROM _dq_s
    """


def dq_violations(
    df: DataFrame, rules: dict[str, Column], id_cols: list[str]
) -> DataFrame:
    """Failing rows: (id_cols..., failed_rules array<string>), only
    rows failing ≥1 rule. One scan; the rule array is built with
    codegen'd array/filter expressions, no per-rule pass."""
    entries = F.array(
        *[
            F.when(_violation(col) == 1, F.lit(name)).otherwise(F.lit(None))
            for name, col in rules.items()
        ]
    )
    failed = F.array_compact(entries).alias("failed_rules")
    out = df.select(*id_cols, failed)
    return out.filter(F.size("failed_rules") > 0)


def dq_violations_sql(
    relation_sql: str, rules_sql: dict[str, str], id_cols: list[str]
) -> str:
    """DuckDB oracle for ``dq_violations``. ``failed_rules`` is
    rendered as a comma-join (rule order = dict order on both sides)
    so the comparison harness hashes a plain string, not an
    engine-specific list rendering."""
    arr = ", ".join(
        f"CASE WHEN ({pred}) THEN NULL ELSE '{name}' END"
        for name, pred in rules_sql.items()
    )
    ids = ", ".join(id_cols)
    return f"""
    WITH _dq_t AS ({relation_sql}),
    _dq_v AS (
        SELECT {ids},
               array_to_string(list_filter([{arr}], x -> x IS NOT NULL), ',')
                   AS failed_rules
        FROM _dq_t
    )
    SELECT {ids}, failed_rules FROM _dq_v WHERE failed_rules <> ''
    """
