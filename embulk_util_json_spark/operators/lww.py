"""Last-writer-wins reduction per key — the dedupe/order core.

north_star: "de-duplicates and orders events per key with
window-over-(conv_id, turn_idx, ts) last-writer-wins". Total order is
(ts, seq): ts alone ties under out-of-order redelivery, so the binlog
position ``seq`` breaks ties (SURVEY.md §7.3 hard-part #1).

Three implementations with identical results (equivalence is tested):

``lww_agg``    — groupBy(keys).agg(max_by(payload, order_struct)).
                 THE SCALE DEFAULT: hash aggregation gets *map-side
                 partial combine*, so a hot key is pre-reduced to one
                 row per input partition before the shuffle — the
                 two-stage reduce the reference's host pipeline would
                 need by hand, done by Spark's physical planner.
``lww_window`` — row_number() over (keys / order desc) == 1. Kept as
                 the literal north_star formulation and as oracle for
                 the others. Full shuffle+sort of every row per key:
                 skew-sensitive, not the scale path.
``lww_salted`` — explicit two-stage: (keys, salt) partial max_by,
                 then (keys) final max_by. max/argmax is associative
                 and commutative, so the split is exact. Useful when a
                 *single* (conv_id, turn_idx) key is so hot that even
                 per-partition partials overwhelm one reducer's input
                 (10^10-event replays with pathological skew), or on
                 engines without partial aggregation.

LWW is an idempotent, commutative, associative monoid over the total
order — duplicate deliveries (same (ts, seq), identical payload)
cannot change the winner, which is what makes replay + at-least-once
delivery safe end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _order_struct(order_cols: list[str]) -> Column:
    return F.struct(*[F.col(c) for c in order_cols])


def lww_agg(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    """One row per key: the payload of the (ts, seq)-max event."""
    payload = [c for c in df.columns if c not in keys]
    winner = F.max_by(F.struct(*[F.col(c) for c in payload]), _order_struct(order_cols))
    out = df.groupBy(*keys).agg(winner.alias("_w"))
    return out.select(*keys, *[F.col("_w")[c].alias(c) for c in payload])


def lww_window(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def lww_patch(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    patch_cols: list[str],
    unchanged_marker: str | None = None,
    absent_if: Column | None = None,
) -> DataFrame:
    """Column-level LWW for partial-update change streams.

    Real CDC feeds carry updates that do NOT restate every column:
    Debezium emits a placeholder for unchanged Postgres TOAST columns
    ("__debezium_unavailable_value"), and wide-row sources routinely
    ship patch-style updates with only the touched fields. Row-level
    LWW (``lww_agg``) would overwrite the untouched columns with the
    placeholder / NULL; the correct merge carries the previous value
    forward. ``lww_patch`` resolves each column INDEPENDENTLY: the
    final value of a patch column is its value in the latest event (by
    ``order_cols``) where it was *present*; non-patch payload columns
    (op, event time, ...) come from the latest event overall.

    "Present" means: not equal to ``unchanged_marker`` when a marker
    is given (explicit NULL then still means "set to NULL" — the
    Debezium contract), else simply non-NULL (sparse patch rows).
    ``absent_if`` additionally marks whole rows as carrying no column
    payload — pass ``F.col("op") == "delete"`` so a tombstone's NULLs
    don't read as explicit writes. A column never present for a key
    resolves to NULL. Carry-forward then looks *through* tombstones —
    per-column LWW over the full history; the row-level ``op`` of the
    overall winner still decides whether the key survives, exactly as
    in the row-level path.

    Scale shape: ONE hash aggregate — per column
    ``max(when(present, struct(order..., value)))``; ``when`` yields
    NULL for absent slots and ``max`` skips NULLs, and the (ts, seq)
    total order makes the trailing value field inert in the struct
    comparison. Column-wise max over a total order is associative and
    commutative, so map-side partial combine applies and the salted
    two-stage split stays exact (same argument as ``lww_salted``)."""
    payload = [c for c in df.columns if c not in keys]
    order_fields = [F.col(o).alias(f"_o{i}") for i, o in enumerate(order_cols)]
    aggs = []
    for c in payload:
        if c in patch_cols:
            col = F.col(c)
            if unchanged_marker is not None:
                present = col.isNull() | (col != F.lit(unchanged_marker))
            else:
                present = col.isNotNull()
            if absent_if is not None:
                present = present & ~absent_if
            slot = F.when(present, F.struct(*order_fields, col.alias("_v")))
        else:
            slot = F.struct(*order_fields, F.col(c).alias("_v"))
        aggs.append(F.max(slot).getField("_v").alias(c))
    return df.groupBy(*keys).agg(*aggs)


def lww_salted(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    salt_buckets: int = 32,
    salt_source: str = "seq",
) -> DataFrame:
    """Two-stage salted LWW. Salt is derived deterministically from
    ``salt_source`` (default the event seq) so replays are bit-stable;
    stage 1 reduces each (key, salt) shard, stage 2 merges the ≤
    ``salt_buckets`` shard winners per key. Exact because argmax over
    a total order is associative + commutative."""
    payload = [c for c in df.columns if c not in keys]
    salt = F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt_buckets)).alias("_salt")
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in payload]), _order_struct(order_cols)
            ).alias("_w")
        )
        .select(*keys, *[F.col("_w")[c].alias(c) for c in payload])
    )
    return lww_agg(stage1, keys, order_cols)
