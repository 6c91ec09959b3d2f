"""Change-history materialization: SCD Type 2 and net-effect compaction.

Two standard downstream shapes a CDC consumer asks of the change
stream the reference's parser feeds its host (JsonParser.java:44-72
produces the value stream; what a warehouse *does* with it):

``scd2_history``      — every surviving change becomes a *version row*
                        with a ``[valid_from, valid_to)`` interval:
                        the classic slowly-changing-dimension type-2
                        table. Delete tombstones close the previous
                        version's interval but emit no row of their
                        own, so a key whose last event is a delete has
                        no current version.
``compact_net_changes`` — collapse a batch of changes to at most ONE
                        net change per key (Debezium/Kafka "compact"
                        semantics): insert…delete annihilates,
                        insert…update nets to an insert carrying the
                        final payload, update/delete-first batches net
                        to update or delete. Feeding the compacted
                        batch to a downstream MERGE produces the same
                        table state as replaying the raw batch.

Scale notes (100 TB / 10^10 events):

* ``scd2_history`` is one window partitioned BY KEY — the shuffle is
  the same (conv_id, turn_idx) hash exchange the LWW apply already
  pays, and the per-task sort is bounded by the per-key version count
  (tens), never a global sort. No unpartitioned window anywhere.
* ``compact_net_changes`` is ONE hash aggregation: ``min_by``/
  ``max_by`` are associative, so Spark's planner gives map-side
  partial combine for free — a hot key is pre-reduced to one row per
  input partition before the exchange (same property the LWW core
  exploits, operators/lww.py:43).

The total order within a key is ``order_cols`` (ts, seq): ts alone
ties under out-of-order redelivery, the binlog position breaks ties
(SURVEY.md §7.3 hard-part #1). Both operators are deterministic under
replay because the order is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    order_cols: list[str],
    op_col: str = "op",
    ts_col: str = "ts",
    seq_col: str = "seq",
    delete_op: str = "delete",
    keep_delete_rows: bool = False,
) -> DataFrame:
    """Changes → SCD Type-2 version table.

    Output: ``keys + payload`` columns plus
    ``valid_from_ts``/``valid_from_seq`` (the event's own position),
    ``valid_to_ts``/``valid_to_seq`` (the NEXT event's position —
    NULL for the open interval), and ``is_current`` (int 0/1; 1 iff
    the interval is open). Delete events close intervals but emit no
    version row.

    ``keep_delete_rows=True`` keeps the delete events as rows (with
    ``op_col`` retained so callers can distinguish them) — the shape
    an INCREMENTAL materialization needs, since repairing intervals
    after a late event requires replaying the key's deletes too.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_cols])
    closed = changes.withColumn("valid_to_ts", F.lead(ts_col).over(w)).withColumn(
        "valid_to_seq", F.lead(seq_col).over(w)
    )
    payload = [
        c
        for c in changes.columns
        if c not in keys and c not in (op_col, ts_col, seq_col)
    ]
    if not keep_delete_rows:
        closed = closed.filter(F.col(op_col) != delete_op)
    return closed.select(
        *keys,
        *([op_col] if keep_delete_rows else []),
        *payload,
        F.col(ts_col).alias("valid_from_ts"),
        F.col(seq_col).alias("valid_from_seq"),
        "valid_to_ts",
        "valid_to_seq",
        F.col("valid_to_ts").isNull().cast("int").alias("is_current"),
    )


def scd2_history_sql(
    changes_sql: str,
    keys: list[str],
    payload: list[str],
    ts_col: str = "ts",
    seq_col: str = "seq",
) -> str:
    """DuckDB twin of :func:`scd2_history` (same column names/types;
    ``is_current`` cast to INTEGER, never a SUM so no HUGEINT risk)."""
    part = ", ".join(keys)
    return f"""
        WITH changes AS ({changes_sql}),
        closed AS (
            SELECT *,
                LEAD({ts_col}) OVER (
                    PARTITION BY {part} ORDER BY {ts_col}, {seq_col}
                ) AS valid_to_ts,
                LEAD({seq_col}) OVER (
                    PARTITION BY {part} ORDER BY {ts_col}, {seq_col}
                ) AS valid_to_seq
            FROM changes
        )
        SELECT {part}, {', '.join(payload)},
               {ts_col} AS valid_from_ts, {seq_col} AS valid_from_seq,
               valid_to_ts, valid_to_seq,
               CAST(valid_to_ts IS NULL AS INTEGER) AS is_current
        FROM closed WHERE op <> 'delete'
    """


def scd2_asof(
    versions: DataFrame,
    asof_us: "int | F.Column",
    keys: list[str] | None = None,
) -> DataFrame:
    """Point-in-time (AS OF) read over an SCD2 version table: the one
    version per key whose ``[valid_from, valid_to)`` interval contains
    the pinned instant (epoch MICROSECONDS — integer, so engine and
    oracle can agree exactly; sub-second float midpoints drift).

    This is a FILTER, not a shuffle: intervals are disjoint per key by
    construction, so at most one version survives per key and no
    re-aggregation is needed — time travel on the history table costs
    one scan. (The equivalent log formulation — LWW over events with
    ts ≤ T — re-shuffles the whole log; the SCD2 table amortizes that
    across every AS OF query, which is the point of materializing it.)
    """
    t = F.lit(asof_us) if isinstance(asof_us, int) else asof_us
    return versions.filter(
        (F.unix_micros(F.col("valid_from_ts")) <= t)
        & (
            F.col("valid_to_ts").isNull()
            | (F.unix_micros(F.col("valid_to_ts")) > t)
        )
    )


def compact_net_changes(
    changes: DataFrame,
    keys: list[str],
    order_cols: list[str],
    op_col: str = "op",
    insert_op: str = "insert",
    delete_op: str = "delete",
) -> DataFrame:
    """Collapse a change batch to ≤1 net change per key.

    Net rules (first/last in ``order_cols`` order within the key):

    * first=insert, last=delete  → key never existed outside the
      batch: emit NOTHING (annihilation).
    * first=insert, last≠delete  → net ``insert`` with the LAST
      payload.
    * first≠insert, last=delete  → net ``delete`` tombstone.
    * otherwise                   → net ``update`` with the LAST
      payload.

    Output columns: ``net_op`` + the full change schema of the last
    event (op replaced by net_op). Replaying the compacted batch
    through a MERGE yields the same final state as the raw batch —
    pinned in tests against the LWW reduction.
    """
    order = F.struct(*[F.col(c) for c in order_cols])
    payload = [c for c in changes.columns if c not in keys]
    agg = changes.groupBy(*keys).agg(
        F.min_by(F.col(op_col), order).alias("_first_op"),
        F.max_by(F.struct(*[F.col(c) for c in payload]), order).alias("_last"),
    )
    first_ins = F.col("_first_op") == insert_op
    last_del = F.col("_last")[op_col] == delete_op
    net_op = (
        F.when(first_ins & last_del, F.lit(None).cast("string"))
        .when(first_ins, F.lit(insert_op))
        .when(last_del, F.lit(delete_op))
        .otherwise(F.lit("update"))
    )
    out_payload = [
        F.col("_last")[c].alias(c) for c in payload if c != op_col
    ]
    return (
        agg.select(*keys, net_op.alias("net_op"), *out_payload)
        .filter(F.col("net_op").isNotNull())
    )


def compact_net_changes_sql(
    changes_sql: str,
    keys: list[str],
    payload: list[str],
    ts_col: str = "ts",
    seq_col: str = "seq",
    insert_op: str = "insert",
    delete_op: str = "delete",
) -> str:
    """DuckDB twin of :func:`compact_net_changes` (two ROW_NUMBER
    windows instead of min_by/max_by — DuckDB's arg_min over a
    composite order is less portable than the rank formulation)."""
    part = ", ".join(keys)
    pay = ", ".join(f"l.{c}" for c in payload)
    return f"""
        WITH changes AS ({changes_sql}),
        ranked AS (
            SELECT *,
                ROW_NUMBER() OVER (
                    PARTITION BY {part} ORDER BY {ts_col}, {seq_col}
                ) AS rna,
                ROW_NUMBER() OVER (
                    PARTITION BY {part} ORDER BY {ts_col} DESC, {seq_col} DESC
                ) AS rnd
            FROM changes
        ),
        firsts AS (
            SELECT {part}, op AS first_op FROM ranked WHERE rna = 1
        ),
        lasts AS (SELECT * FROM ranked WHERE rnd = 1)
        SELECT * FROM (
            SELECT {', '.join('l.' + k for k in keys)},
                CASE
                    WHEN f.first_op = '{insert_op}' AND l.op = '{delete_op}'
                        THEN NULL
                    WHEN f.first_op = '{insert_op}' THEN '{insert_op}'
                    WHEN l.op = '{delete_op}' THEN '{delete_op}'
                    ELSE 'update'
                END AS net_op,
                {pay}
            FROM lasts l JOIN firsts f USING ({part})
        ) WHERE net_op IS NOT NULL
    """
