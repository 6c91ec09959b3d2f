"""Primary-key-change expansion for CDC update events.

When a source UPDATE changes the row's primary key, wire formats ship
the OLD key alongside the new row image (Debezium emits a
``delete``+``create`` pair keyed by ``__debezium.newkey``; Maxwell and
pgoutput put the previous key in ``old``). A key-equi MERGE that only
sees the new key leaves the stale row behind at the old key — the
classic key-change ghost. The reference's capture stage has no MERGE
and cannot hit this (SURVEY.md §6 delegates load semantics to the
host); a Spark sink must expand the event before the merge exchange.

:func:`expand_key_changes` rewrites each change row carrying an
old-key image into TWO rows — a ``delete`` tombstone addressed at the
old key plus the change itself at the new key — in ONE projection
(``F.inline`` over a conditional struct array, whole-stage codegen;
no second scan, no union-of-filters double read). Rows without an
old-key image pass through 1:1. Both emitted rows keep the source
event's ``(ts, seq)`` stamp: they address DIFFERENT keys, so the LWW
reduction at each key stays deterministic, and the tombstone
participates in ordering at the old key exactly like a native delete
(a later re-insert at the old key out-stamps it; an earlier stale
update loses to it).

Scale shape: a narrow map-side projection that at most doubles the
handful of key-moving rows before the one merge shuffle — no extra
exchange, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DELETE_OP = "delete"


def expand_key_changes(
    changes: DataFrame,
    old_key_map: dict[str, str],
    op_col: str = "op",
) -> DataFrame:
    """``changes`` with nullable old-key columns → expanded stream.

    ``old_key_map`` maps each key column to the column holding its
    previous value (NULL = key did not move). Output drops the old-key
    columns; a row with ANY non-null old-key value yields a tombstone
    at the old key followed by the row at the new key.
    """
    old_cols = set(old_key_map.values())
    out_cols = [c for c in changes.columns if c not in old_cols]

    def as_struct(op_value=None, key_from_old: bool = False):
        fields = []
        for c in out_cols:
            if op_value is not None and c == op_col:
                fields.append(F.lit(op_value).alias(c))
            elif key_from_old and c in old_key_map:
                # the tombstone addresses the OLD key; cast back to the
                # new-key column's type so the inline struct is uniform
                fields.append(
                    F.col(old_key_map[c])
                    .cast(changes.schema[c].dataType)
                    .alias(c)
                )
            else:
                fields.append(F.col(c).alias(c))
        return F.struct(*fields)

    moved = F.lit(False)
    for new_c, old_c in old_key_map.items():
        moved = moved | (
            F.col(old_c).isNotNull()
            & ~F.col(old_c).cast("string").eqNullSafe(
                F.col(new_c).cast("string")
            )
        )

    rows = F.when(
        moved,
        F.array(as_struct(op_value=DELETE_OP, key_from_old=True), as_struct()),
    ).otherwise(F.array(as_struct()))
    return changes.select(F.inline(rows))
