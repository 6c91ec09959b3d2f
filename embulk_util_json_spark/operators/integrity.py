"""Before-image conflict detection: catch out-of-band source drift.

Row-image wire formats carry the row's BEFORE image on updates and
deletes (Debezium's ``before`` block, pgoutput REPLICA IDENTITY FULL,
Maxwell's ``old``). In a healthy feed, an event's before image equals
the previous event's after image for the same key — the capture
stream is the complete write history. When it doesn't, something
wrote to the source outside the captured stream (a direct DML, a
restored backup, a lost WAL range the fencing never saw): the classic
lost-update hazard that silently corrupts a replica long before a
checksum run notices. This is the per-event integrity audit — the
stream-time complement of ``pipeline/reconcile``'s at-rest checksums
(reference analogue: the row-skippable error taxonomy of
``JsonParser.java`` guards a single document's WELL-FORMEDNESS; this
guards the stream's CAUSALITY).

:func:`detect_before_image_conflicts` annotates each change row with
``conflict`` / ``conflict_reason`` / per-column ``expected_*`` values
by comparing its before-image columns against the LAG of the previous
event's after image over ONE key-partitioned window — the same hash
exchange shape as the LWW apply itself (never a global window), so it
rides the merge shuffle for free at any scale. Rules:

- only ops in ``ops`` (default update/delete) are audited; inserts
  carry no before image by construction;
- a row whose before-image columns are all NULL is skipped (formats
  with REPLICA IDENTITY DEFAULT simply don't ship the image);
- a non-null before image with NO predecessor event is a conflict
  (``no_predecessor`` — the creating insert was never captured);
- otherwise any null-safe per-column inequality between the before
  image and the predecessor's values is a conflict (``mismatch``).

Downstream policy is the caller's: quarantine conflicts to the DLQ,
fence the feed, or trigger a targeted ``reconcile`` of the touched
buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

REASON_NO_PREDECESSOR = "no_predecessor"
REASON_MISMATCH = "mismatch"


def detect_before_image_conflicts(
    changes: DataFrame,
    keys: list[str],
    order_cols: list[str],
    before_map: dict[str, str],
    op_col: str = "op",
    ops: tuple[str, ...] = ("update", "delete"),
) -> DataFrame:
    """``before_map`` maps each audited after-image column to the
    column carrying its before-image value. Returns ``changes`` plus
    ``conflict`` (boolean), ``conflict_reason`` (NULL when clean) and
    ``expected_<col>`` (the predecessor's value) per audited column."""
    check_cols = list(before_map)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_cols])
    prev = F.lag(F.struct(*[F.col(c).alias(c) for c in check_cols])).over(w)

    out = changes.withColumn("_prev", prev)
    audited = F.col(op_col).isin(list(ops))
    has_before = F.lit(False)
    for bcol in before_map.values():
        has_before = has_before | F.col(bcol).isNotNull()
    mismatch = F.lit(False)
    for c, bcol in before_map.items():
        mismatch = mismatch | ~F.col(bcol).eqNullSafe(F.col("_prev")[c])
    conflict = audited & has_before & (F.col("_prev").isNull() | mismatch)
    reason = F.when(
        conflict,
        F.when(
            F.col("_prev").isNull(), F.lit(REASON_NO_PREDECESSOR)
        ).otherwise(F.lit(REASON_MISMATCH)),
    )
    out = out.withColumn("conflict", conflict).withColumn(
        "conflict_reason", reason
    )
    for c in check_cols:
        out = out.withColumn(f"expected_{c}", F.col("_prev")[c])
    return out.drop("_prev")
