"""Temporal operators: as-of join, temporal table join, sessionization.

All are built on window functions only (no custom shuffle logic):

- ``asof_join`` uses the union-tag trick: tag and union both sides,
  sort within each key partition by (ts, side), and carry the latest
  right-side payload forward with ``last_value(ignorenulls)``. One
  shuffle on the key — the same cost as a plain join, without a range
  condition blowing up the join planner. This is the standard Spark
  formulation of the kdb/pandas ``merge_asof``.
- ``temporal_enrich`` is the event-time temporal table join (the
  "dimension attributes AS OF each fact's event time" shape):
  asof_join against an SCD2 version table's ``valid_from`` plus an
  interval-liveness mask, so deletion gaps yield NULLs instead of a
  stale carried payload.
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


def temporal_enrich(
    facts: DataFrame,
    versions: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    attrs: list[str] | None = None,
    suffix: str = "_dim",
) -> DataFrame:
    """Temporal table join (event-time enrichment): for each fact row,
    attach the SCD2 dimension attributes valid AS OF the fact's event
    time — the version with ``valid_from <= ts`` and ``valid_to`` null
    or ``> ts`` (half-open intervals, as :func:`operators.history.
    scd2_history` builds them). Facts inside a deletion gap (interval
    closed with no live successor) or before the key's first version
    get NULL attributes — the semantic a plain :func:`asof_join`
    cannot express: it would carry a deleted key's last payload
    forward forever.

    Built ON ``asof_join`` rather than a range join: pick the last
    version with ``valid_from_ts <= ts`` (tiebreak ``valid_from_seq``,
    so same-instant version chains resolve to the binlog-latest), then
    mask the attributes where that version's interval closed at/before
    the fact's ts. Intervals per key are ordered and non-overlapping
    by construction, so the last-starting version is the only
    containment candidate — the mask is exact, not a heuristic.

    Scale: ONE hash exchange on the key (the union-tag window), the
    same shuffle a key-equi join would pay, with no range condition to
    push the planner toward a nested-loop join; dimension history is
    per-key bounded (version counts in the tens) while facts are
    unbounded, which is exactly the shape the union window handles
    without skew amplification.
    """
    reserved = (
        "valid_from_ts",
        "valid_from_seq",
        "valid_to_ts",
        "valid_to_seq",
        "is_current",
    )
    attrs = attrs or [
        c for c in versions.columns if c not in on and c not in reserved
    ]
    rhs = versions.select(
        *on,
        F.col("valid_from_ts").alias(ts_col),
        "valid_from_seq",
        "valid_to_ts",
        *attrs,
    )
    joined = asof_join(
        facts,
        rhs,
        on=on,
        ts_col=ts_col,
        right_cols=["valid_from_seq", "valid_to_ts", *attrs],
        suffix=suffix,
        right_tiebreak="valid_from_seq",
    )
    alive = F.col(f"valid_to_ts{suffix}").isNull() | (
        F.col(f"valid_to_ts{suffix}") > F.col(ts_col)
    )
    return joined.select(
        *facts.columns,
        *[
            F.when(alive, F.col(f"{a}{suffix}")).alias(f"{a}{suffix}")
            for a in attrs
        ],
    )


def temporal_enrich_sql(
    facts_sql: str,
    versions_sql: str,
    keys: list[str],
    attrs: list[str],
    fact_cols: list[str],
    ts_col: str = "ts",
    suffix: str = "_dim",
) -> str:
    """DuckDB twin of :func:`temporal_enrich` — deliberately the
    INDEPENDENT interval formulation (LEFT JOIN on key equality +
    containment), so a hash match cross-checks the engine's window
    walk against the declarative range-join semantics rather than
    re-deriving the same plan twice."""
    onc = " AND ".join(f"f.{k} = v.{k}" for k in keys)
    sel_f = ", ".join(f"f.{c}" for c in fact_cols)
    sel_a = ", ".join(f"v.{a} AS {a}{suffix}" for a in attrs)
    return f"""
        WITH facts AS ({facts_sql}),
        versions AS ({versions_sql})
        SELECT {sel_f}, {sel_a}
        FROM facts f
        LEFT JOIN versions v
          ON {onc}
         AND v.valid_from_ts <= f.{ts_col}
         AND (v.valid_to_ts IS NULL OR v.valid_to_ts > f.{ts_col})
    """


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
