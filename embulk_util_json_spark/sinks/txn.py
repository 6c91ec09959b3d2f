"""Atomic multi-table transactions over independent snapshot sinks.

``route_tables`` (streaming/runner.py) demultiplexes a multi-table
change stream into per-table sinks with per-table exactly-once — but
each table COMMITS independently: a crash between table-applies
leaves readers seeing table A's half of a source transaction without
table B's. Real CDC streams carry transaction boundaries (Debezium's
transaction-metadata topic, MySQL binlog XID events), and downstream
consumers joining the demuxed tables need them respected.

This module adds the catalog-level commit the reference's host
pipeline delegates to its storage plugin (embulk transaction scope:
``ExecSession`` wraps a page-source/sink pair in one transaction —
``reference/src/main/java/org/embulk/util/json/JsonParser.java`` has
no storage side at all, so the semantics here are the engine-add
half, per SURVEY §2.4): a tiny ordered log of committed transaction
records, each mapping every participating table to the manifest
version its slice produced. Visibility becomes atomic without
touching the data path:

- ``txn_apply`` applies every table's slice (each sink's own
  batch-id log keeps the per-table apply exactly-once), then
  publishes ONE record via the same tmp+``os.link`` atomic-publish
  protocol the sink manifests use. Until that link lands, NO table's
  new version is visible through the transaction view — a crash
  mid-transaction leaves the previous consistent snapshot readable.
- Replaying a half-applied transaction is convergent: committed
  table-applies skip (sink batch ids), missing ones run, and the
  record commits once — the presumed-abort / redo-on-replay protocol
  (same recovery contract as ``ParquetSnapshotSink.apply``'s
  crash-between-write-and-commit pin).
- ``consistent_read`` pins every table to the versions of the LAST
  committed record (sink time travel over immutable manifests), so a
  cross-table join never observes a torn transaction even while a
  new one is mid-apply.

Scale shape: the log is one small JSON per transaction (micro-batch
cadence, not row cadence) and the reads are the sinks' normal pruned
time-travel reads — zero data-path overhead. The cumulative
``txn_ids`` list in the head record mirrors the sink manifests'
``batch_ids`` dedup ledger (same growth rate, same accepted bound:
one entry per micro-batch).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame

from .snapshot import ConcurrentCommitError, ParquetSnapshotSink


class TransactionLog:
    """Ordered log of committed multi-table transaction records under
    ``root/_txns`` (sibling of the participating sinks, typically)."""

    def __init__(self, root: str) -> None:
        self._dir = os.path.join(root, "_txns")
        os.makedirs(self._dir, exist_ok=True)

    # ---- record log (same protocol as the sink manifest log) --------

    def _path(self, seq: int) -> str:
        return os.path.join(self._dir, f"t{seq:08d}.json")

    def current_seq(self) -> int:
        seqs = [
            int(f[1:9])
            for f in os.listdir(self._dir)
            if f.startswith("t") and f.endswith(".json")
        ]
        return max(seqs, default=0)

    def record_at(self, seq: int) -> dict | None:
        if seq <= 0:
            return None
        with open(self._path(seq)) as fh:
            return json.load(fh)

    def head(self) -> dict | None:
        return self.record_at(self.current_seq())

    def _commit(self, record: dict) -> None:
        """Atomic optimistic publish — tmp + ``os.link`` (fails on an
        existing seq instead of clobbering), exactly like
        ``ParquetSnapshotSink._commit``."""
        path = self._path(record["seq"])
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(record, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise ConcurrentCommitError(
                f"txn seq {record['seq']} was committed by another "
                "coordinator; re-read the log and retry"
            ) from None
        finally:
            os.unlink(tmp)

    # ---- transactions ------------------------------------------------

    def txn_apply(
        self,
        sinks: dict[str, ParquetSnapshotSink],
        slices: dict[str, DataFrame],
        txn_id: str,
        max_retries: int = 3,
    ) -> dict:
        """Apply one multi-table transaction: every table's slice
        lands (per-table exactly-once via the sinks' batch-id logs),
        then ONE atomic record makes all of them visible together.

        Idempotent on ``txn_id``: a committed transaction is a skip.
        A crash after some table-applies but before the record commit
        leaves the transaction INVISIBLE (``consistent_read`` still
        serves the previous record); re-running it completes the
        remaining applies (landed ones skip) and commits — the redo
        protocol, convergent in any interleaving."""
        unknown = [t for t in slices if t not in sinks]
        if unknown:
            raise ValueError(f"slices for unregistered tables: {unknown}")
        head = self.head()
        if head and txn_id in head.get("txn_ids", []):
            return {"txn_id": txn_id, "skipped": True, "reason": "already-committed"}
        results = {
            name: sinks[name].apply(sl, f"{txn_id}:{name}")
            for name, sl in slices.items()
        }
        for _ in range(max_retries + 1):
            head = self.head()
            if head and txn_id in head.get("txn_ids", []):
                return {"txn_id": txn_id, "skipped": True, "reason": "already-committed"}
            versions = dict(head["tables"]) if head else {}
            versions.update(
                {name: sinks[name].current_version() for name in slices}
            )
            record = {
                "seq": (head["seq"] if head else 0) + 1,
                "txn_id": txn_id,
                "tables": versions,
                "txn_ids": (head.get("txn_ids", []) if head else []) + [txn_id],
            }
            try:
                self._commit(record)
                return {"txn_id": txn_id, "tables": results, "seq": record["seq"]}
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(
            f"txn {txn_id!r}: lost the commit race {max_retries + 1} times"
        )

    def committed_versions(self) -> dict[str, int]:
        """Per-table manifest versions of the last committed
        transaction — the consistent cross-table snapshot."""
        head = self.head()
        return dict(head["tables"]) if head else {}

    def consistent_read(
        self, sinks: dict[str, ParquetSnapshotSink], at_seq: int | None = None
    ) -> dict[str, DataFrame]:
        """Every registered table AS OF one committed transaction
        (the head by default): tables the snapshot hasn't seen read
        empty (typed via the sink's schema derivation), never the
        possibly-torn current state."""
        record = self.record_at(at_seq) if at_seq else self.head()
        versions = dict(record["tables"]) if record else {}
        out = {}
        for name, sink in sinks.items():
            v = int(versions.get(name, 0))
            out[name] = (
                sink.read(at_version=v) if v > 0 else sink._empty_state_frame()
            )
        return out
