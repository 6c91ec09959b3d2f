"""Incremental materialized views over the CDC table (derived-table
maintenance).

A CDC pipeline rarely ends at the upserted base table: training-data
prep consumes *assembled conversations* (one document per conv_id),
and at 10^10 events reassembling every conversation after every
micro-batch is O(table) work per batch. This operator maintains the
assembled view INCREMENTALLY: each refresh recomputes only the
conversations the batch touched, using the sink's two-level
``probe_keys`` pruning (only the touched keys' bucket chains are
opened, then a broadcast semi-join restricts the merge to touched
keys) — per-batch cost is O(touched conversations), not O(table).

The view itself is a second ``ParquetSnapshotSink`` keyed by
``conv_id`` — the same bucketed exactly-once machinery as the base
table, pointed at derived state (precedent:
``incremental.IncrementalDeduper``'s fingerprint store):

- refreshes are idempotent on batch_id (redelivery after a crash is
  a no-op via the sink's batch log);
- the LWW order column is the SOURCE manifest version the refresh
  read — monotone across refreshes because every refresh follows a
  source apply. Two refreshes at the same version (a crash-recovery
  re-read under a new batch_id) write byte-identical rows (the
  refresh is a deterministic function of source state), so the tie
  is harmless;
- a conversation whose last turn was deleted from the base table
  refreshes to a ``delete`` tombstone — it leaves the view exactly
  as a row delete leaves the base table.

Convergence under replay: refreshes applied in batch order reproduce
"assemble the final state" exactly; a refresh that runs late (after
MORE source batches were applied) reads newer source state for its
touched keys, which a later refresh of those keys overwrites or
confirms — the view converges to assemble(final state) whenever every
touched set is eventually refreshed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sinks.snapshot import ParquetSnapshotSink
from .transcripts import assemble_conversations

VIEW_COLS = ["conv_id", "document", "n_turns"]


class IncrementalConversationView:
    def __init__(
        self,
        spark: SparkSession,
        source: ParquetSnapshotSink,
        root: str,
        num_buckets: int | None = None,
        mode: str = "mor",
    ) -> None:
        self.spark = spark
        self.source = source
        self.view = ParquetSnapshotSink(
            spark,
            root,
            num_buckets=num_buckets or source.num_buckets,
            keys=["conv_id"],
            order_cols=["src_version"],
            bucket_by="conv_id",
            mode=mode,
        )

    def refresh(self, touched: DataFrame, batch_id: str) -> dict:
        """Re-derive the view rows for ``touched`` (a DataFrame with a
        ``conv_id`` column — normally the batch's change rows) and
        MERGE them. One key-pruned source read + one view apply."""
        # Both metadata-sized frames are consumed several times (ids:
        # bucket-probe collect, probe semi-join, tombstone anti-join;
        # docs: upsert branch + anti-join): checkpoint so the batch's
        # parse and the pruned read+assemble each run exactly once.
        ids = (
            touched.select("conv_id")
            .filter(F.col("conv_id").isNotNull())
            .distinct()
            .localCheckpoint()
        )
        version = self.source.current_version()
        turns = self.source.read(probe_keys=ids)
        docs = assemble_conversations(turns).localCheckpoint()
        gone = ids.join(docs, "conv_id", "left_anti")
        changes = docs.select(
            "conv_id",
            "document",
            "n_turns",
            F.lit(version).cast("long").alias("src_version"),
            F.lit("update").alias("op"),
        ).unionByName(
            gone.select(
                "conv_id",
                F.lit(None).cast("string").alias("document"),
                F.lit(None).cast("int").alias("n_turns"),
                F.lit(version).cast("long").alias("src_version"),
                F.lit("delete").alias("op"),
            )
        )
        return self.view.apply(changes, batch_id)

    def read(self) -> DataFrame:
        """Current view state: (conv_id, document, n_turns)."""
        return self.view.read().select(*VIEW_COLS)
