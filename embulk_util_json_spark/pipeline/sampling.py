"""Deterministic corpus sampling and split assignment.

Curation pipelines need samples and train/val/test splits that are
(a) reproducible run-to-run with no stored state, (b) stable under
re-partitioning and cluster-size changes, and (c) consistent across
engines so an oracle can audit them. ``rand(seed)`` fails (a)/(b) —
its value depends on partition layout. Hash-based assignment keys the
decision on the ROW ID alone: bucket = first 32 md5 bits of
``salt || id`` (md5 is bit-stable across engines — same convention as
the dedup/LSH family, dedup.py:34), so membership is a pure function
of (id, salt), survives any shuffle, and re-running over a grown
corpus keeps every previously-sampled id in the sample.

All expressions are codegen'd column arithmetic — no shuffle, no UDF;
the sample/split is decided during the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_BUCKETS = 1 << 32


def _hash_bucket(id_col: Column, salt: str) -> Column:
    """Uniform bucket in [0, 2^32) from salt || id — portable md5
    arithmetic (DuckDB reproduces it exactly)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def hash_sample(
    df: DataFrame, id_col: str, keep_frac: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic ``keep_frac`` sample keyed on the row id: a row is
    in the sample iff bucket(salt || id) < frac · 2^32. Changing the
    salt draws an independent sample; growing the corpus never evicts
    previously-sampled ids."""
    if not 0.0 <= keep_frac <= 1.0:
        raise ValueError("keep_frac must be in [0, 1]")
    threshold = int(keep_frac * _BUCKETS)
    return df.filter(_hash_bucket(F.col(id_col), salt) < F.lit(threshold))


def hash_sample_sql(
    table: str, id_col: str, keep_frac: float, salt: str = "sample"
) -> str:
    threshold = int(keep_frac * _BUCKETS)
    return f"""
        SELECT * FROM {table}
        WHERE CAST(('0x' || substr(md5('{salt}' || CAST({id_col} AS VARCHAR)), 1, 8))
                   AS BIGINT) < {threshold}
    """


def assign_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning each row to one of the named
    splits with the given weights (must sum to ~1). Assignment is a
    pure function of (id, salt): disjoint bucket ranges over the same
    md5 bucket space, so the split partition is exhaustive, disjoint,
    reproducible, and stable under corpus growth."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1 (got {total})")
    bucket = _hash_bucket(F.col(id_col), salt)
    expr = None
    hi = 0
    names = list(weights)
    for i, name in enumerate(names):
        hi = _BUCKETS if i == len(names) - 1 else hi + int(weights[name] * _BUCKETS)
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


def assign_split_sql(
    table: str, id_col: str, weights: dict[str, float], salt: str = "split"
) -> str:
    bucket = (
        f"CAST(('0x' || substr(md5('{salt}' || CAST({id_col} AS VARCHAR)), 1, 8)) "
        "AS BIGINT)"
    )
    clauses = []
    hi = 0
    names = list(weights)
    for i, name in enumerate(names):
        hi = _BUCKETS if i == len(names) - 1 else hi + int(weights[name] * _BUCKETS)
        clauses.append(f"WHEN {bucket} < {hi} THEN '{name}'")
    case = "CASE " + " ".join(clauses) + " END"
    return f"SELECT *, {case} AS split FROM {table}"
