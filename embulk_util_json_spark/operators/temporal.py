"""Temporal operators: as-of join and gap sessionization.

Both are built on window functions only (no custom shuffle logic):

- ``asof_join`` uses the union-tag trick: tag and union both sides,
  sort within each key partition by (ts, side), and carry the latest
  right-side payload forward with ``last_value(ignorenulls)``. One
  shuffle on the key — the same cost as a plain join, without a range
  condition blowing up the join planner. This is the standard Spark
  formulation of the kdb/pandas ``merge_asof``.
- ``sessionize`` assigns gap-based session ids per key: a new session
  starts where the gap from the previous event exceeds ``gap_sec``;
  the session id is the running count of session starts (cumulative
  sum over the ordered window).

Scale notes: both are single-shuffle, codegen'd window plans; skewed
keys pre-aggregate nothing here (windows need full per-key order), so
pathological keys should be bounded upstream (the CDC path's salted
LWW exists for that; sessions/as-of are per-entity timelines, which
are naturally bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row of the same
    key with ``right.ts <= left.ts`` (NULLs when none). Exact ties
    are visible to the left row; among right rows sharing a timestamp
    the one with the greatest ``right_tiebreak`` wins (pass one when
    right timestamps can repeat per key — makes the result a total
    function)."""
    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != ts_col
    ]
    lhs = left.withColumn("_side", F.lit(1))
    rhs = right.select(
        *on,
        F.col(ts_col),
        F.struct(
            F.col(ts_col).alias(f"{ts_col}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        ).alias("_r"),
    ).withColumn("_side", F.lit(0))
    if right_tiebreak:
        rhs = rhs.withColumn("_tb", F.col("_r")[f"{right_tiebreak}{suffix}"])
        lhs = lhs.withColumn("_tb", F.lit(None).cast(dict(rhs.dtypes)["_tb"]))
    else:
        lhs = lhs.withColumn("_tb", F.lit(None).cast("long"))
        rhs = rhs.withColumn("_tb", F.lit(None).cast("long"))
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    # right rows (side 0) sort before left rows at equal ts → a right
    # row at exactly left.ts is matched (<= semantics).
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col(ts_col).asc(), F.col("_side").asc(), F.col("_tb").asc_nulls_last()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).drop("_side", "_r", "_tb")
    for c in [f"{ts_col}{suffix}"] + [f"{c}{suffix}" for c in right_cols]:
        out = out.withColumn(c, F.col("_last_r")[c])
    return out.drop("_last_r")


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_sec: int = 1800,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key gap sessionization: rows whose gap from the previous
    event exceeds ``gap_sec`` starts a new session. Returns one row per
    session: (keys, session_id, session_start, session_end, n_events).
    ``session_id`` is 1-based in event-time order within the key.

    ``tiebreak_cols`` pins a total order when a key can carry duplicate
    timestamps — without it the window order (hence lag/cumsum
    evaluation) is nondeterministic on ties. The session *grouping* is
    tie-order-invariant (a zero gap never starts a session), but a
    deterministic order keeps plans, tests, and oracle comparisons
    stable by construction rather than by argument."""
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # microsecond epoch on both engines (DuckDB: epoch_us) — a plain
    # seconds cast truncates fractional seconds and diverges.
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = us - F.lag(us).over(w)
    starts = F.when(gap.isNull() | (gap > gap_sec * 1_000_000), 1).otherwise(0)
    sessioned = df.withColumn(
        "session_id",
        F.sum(starts)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return sessioned.groupBy(*key_cols, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).cast("int").alias("n_events"),
    )
