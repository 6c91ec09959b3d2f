"""Checksum reconciliation: detect and repair out-of-band table damage.

A replica maintained by the CDC apply path can silently diverge from
the authoritative log for reasons the exactly-once machinery cannot
see: bit-rot in a data file, a partial out-of-band write, an operator
"fixing" rows by hand, a restore from a stale backup. The classic
answer (Percona pt-table-checksum, Debezium's incremental-snapshot
re-validation) is to compare cheap per-chunk checksums of replica vs
source and re-sync ONLY the chunks that disagree — never a full
re-copy.

This module is that loop for :class:`~..sinks.snapshot.
ParquetSnapshotSink` tables, with the sink's hash buckets as the
chunks:

- :func:`bucket_checksums` — one hash aggregation producing, per
  bucket, the row count and an ORDER-INSENSITIVE digest (``bit_xor``
  of per-row ``xxhash64`` over every compared column: commutative and
  associative, so it map-side combines and is insensitive to row
  order, file order, and chain layout; no sum overflow under ANSI
  mode). One scan, one tiny exchange of ≤ num_buckets rows.
- :func:`verify_and_repair` — checksums of the replica's visible
  state vs the authoritative truth, full-outer-joined (metadata-sized
  — ≤ num_buckets rows collected driver-side), then
  ``sink.restore_buckets`` rewrites exactly the disagreeing buckets
  from truth. Matching buckets are never read twice, never rewritten.

Scale shape: the expensive side is the two checksum scans, each a
single pass with map-side partial aggregation — no join of the two
TABLES, only of their ≤ num_buckets summaries. Repair cost is
proportional to the damage, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sinks.snapshot import ParquetSnapshotSink

DELETE_OP = "delete"


def bucket_checksums(
    df: DataFrame, bucket_expr, cols: list[str]
) -> DataFrame:
    """Per-bucket (n_rows, digest) summary of ``df`` over ``cols``.
    The digest is ``bit_xor(xxhash64(cols...))`` — order-insensitive,
    overflow-free, map-side combinable."""
    return (
        df.select(
            bucket_expr.alias("bucket"),
            F.xxhash64(*[F.col(c) for c in cols]).alias("_d"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(_d)").alias("digest"),
        )
    )


def verify_and_repair(
    sink: ParquetSnapshotSink,
    truth_reduced: DataFrame,
    repair: bool = True,
) -> dict:
    """Compare the sink's visible state against the authoritative
    reduced state, bucket by bucket; rewrite disagreeing buckets from
    ``truth_reduced`` (the chain-schema frame ``restore_buckets``
    expects: op + order cols + keys + payload, tombstones included).

    Returns ``{"buckets_checked", "mismatched", "repaired",
    "version"}``; with ``repair=False`` it is a pure audit."""
    cur = sink.read()
    cols = list(cur.columns)
    visible_truth = truth_reduced.filter(F.col("op") != DELETE_OP).select(*cols)

    def summarize(df: DataFrame, side: str) -> DataFrame:
        s = bucket_checksums(df, sink._bucket_expr(), cols)
        return s.select(
            "bucket",
            F.col("n_rows").alias(f"n_{side}"),
            F.col("digest").alias(f"d_{side}"),
        )

    j = summarize(cur, "cur").join(
        summarize(visible_truth, "tr"), "bucket", "full_outer"
    )
    rows = j.collect()  # metadata-sized: <= num_buckets rows
    mismatched = sorted(
        int(r.bucket)
        for r in rows
        if r.n_cur != r.n_tr or r.d_cur != r.d_tr
    )
    out = {
        "buckets_checked": len(rows),
        "mismatched": mismatched,
        "repaired": [],
        "version": sink.current_version(),
    }
    if mismatched and repair:
        res = sink.restore_buckets(truth_reduced, mismatched)
        out["repaired"] = mismatched
        out["version"] = res["version"]
    return out
