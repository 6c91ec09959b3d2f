"""Cross-batch in-order commit fencing for the CDC apply path.

``pipeline/disorder.fence_at_first_gap`` answers the one-shot
question "what prefix of THIS frame is contiguous?". A continuously
tailing apply needs the stateful version: the applied frontier must
never pass a hole in the binlog, across micro-batches, until the hole
is filled (refetched) or explicitly abandoned. Without it, a dropped
WAL segment lets the sink expose a state that a late refetch would
retroactively change — e.g. the missing event is the delete between
two updates (reference analogue: the row-skippable error taxonomy of
``JsonParser.java`` guards a single document; this guards the ORDER
contract of the whole feed).

:class:`FencedApplier` wraps ``apply_events_batch`` with two pieces of
durable state in a work dir:

- ``fence.json`` — ``next_seq`` (the applied contiguous frontier + 1)
  and the current pending-file name, written atomically (tmp + rename,
  same pattern as the sink manifest);
- ``pending-<fence>.parquet`` — the held-back suffix (rows at/past the
  first unfilled hole), re-written each batch.

Per batch: union incoming with pending, drop rows below the frontier
(redelivered duplicates — already applied), compute the first missing
position at/after the frontier with the range-parallel gap detector,
apply the contiguous prefix through the sink's exactly-once MERGE,
persist the rest as the new pending set, then advance the frontier.

Crash safety is ordering, not locking: (1) the apply is idempotent —
its batch id is a pure function of the frontier pair, so a redo after
a crash between apply and state-write is skipped by the sink's batch
log; (2) the pending file for the new frontier is written before the
state points at it; (3) stale pending files are unreferenced garbage,
removed opportunistically. At-least-once redelivery of source batches
is therefore safe end to end.

Scale shape: everything is DataFrame work — the union is two parquet
scans, the gap scan is the range-parallel detector (never a global
window), the fence is one broadcast row, and held-back rows never
enter the merge exchange. Driver-side state is O(1): two longs and a
file name. The pending store is a real risk surface at 100 TB ONLY if
a hole goes unfilled while the tail keeps growing — ``pending_rows``
is reported on every result so an operator can alarm on it, and
``abandon_below`` moves the fence past a hole that will never be
refetched (the documented escape hatch).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..pipeline.disorder import seq_gaps
from ..sinks.snapshot import ParquetSnapshotSink
from .runner import apply_events_batch


class FencedApplier:
    def __init__(
        self,
        spark: SparkSession,
        sink: ParquetSnapshotSink,
        work_dir: str,
        seq_col: str = "seq",
        evolve: bool = True,
        parse_fn=None,
        n_ranges: int = 64,
    ):
        self.spark = spark
        self.sink = sink
        self.work_dir = work_dir
        self.seq_col = seq_col
        self.evolve = evolve
        self.parse_fn = parse_fn
        self.n_ranges = n_ranges
        os.makedirs(work_dir, exist_ok=True)

    # -- durable state ------------------------------------------------

    @property
    def _state_path(self) -> str:
        return os.path.join(self.work_dir, "fence.json")

    def _state(self) -> dict:
        if not os.path.exists(self._state_path):
            return {"next_seq": None, "pending": None}
        with open(self._state_path) as f:
            return json.load(f)

    def _write_state(self, state: dict) -> None:
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._state_path)

    def _pending_df(self, state: dict) -> DataFrame | None:
        name = state.get("pending")
        if not name:
            return None
        path = os.path.join(self.work_dir, name)
        if not os.path.exists(path):
            return None
        return self.spark.read.parquet(path)

    def _gc_pending(self, keep: str | None) -> None:
        for f in os.listdir(self.work_dir):
            if f.startswith("pending-") and f != keep:
                shutil.rmtree(os.path.join(self.work_dir, f), ignore_errors=True)

    # -- the apply ----------------------------------------------------

    def apply(self, events: DataFrame) -> dict:
        """Ingest one micro-batch (raw envelope rows with ``seq_col``).
        Applies the contiguous prefix, holds back the rest. Returns the
        sink apply result plus fence telemetry (``fence_next_seq``,
        ``applied_rows``, ``pending_rows``, ``held_batch``)."""
        s = F.col(self.seq_col)
        state = self._state()
        union = events
        pending = self._pending_df(state)
        if pending is not None:
            union = events.unionByName(pending)
        if state["next_seq"] is not None:
            # rows below the frontier are redelivered duplicates of
            # already-applied positions — drop before any shuffle
            union = union.filter(s >= state["next_seq"])
        union = union.localCheckpoint()  # scanned 3× (bounds/gaps/apply)

        b = union.agg(F.min(s).alias("lo"), F.max(s).alias("hi")).collect()[0]
        if b.lo is None:
            return {
                "skipped": True,
                "fence_next_seq": state["next_seq"],
                "applied_rows": 0,
                "pending_rows": 0,
            }
        start = state["next_seq"] if state["next_seq"] is not None else int(b.lo)
        if int(b.lo) > start:
            fence = start  # the hole is still open at the frontier
        else:
            g = (
                seq_gaps(union, self.seq_col, n_ranges=self.n_ranges)
                .agg(F.min("gap_start").alias("g"))
                .collect()[0]
            )
            fence = int(g.g) if g.g is not None else int(b.hi) + 1

        applicable = union.filter(s < fence)
        held = union.filter(s >= fence)
        result = {"skipped": True, "fence_next_seq": fence}
        if fence > start:
            result = apply_events_batch(
                applicable,
                self.sink,
                f"fence-{start}-{fence}",
                evolve=self.evolve,
                parse_fn=self.parse_fn,
            )
            result["fence_next_seq"] = fence
            result["applied_rows"] = applicable.count()
        else:
            result["applied_rows"] = 0

        n_held = held.count()
        pending_name = None
        if n_held:
            pending_name = f"pending-{fence}.parquet"
            held.write.mode("overwrite").parquet(
                os.path.join(self.work_dir, pending_name)
            )
        self._write_state({"next_seq": fence, "pending": pending_name})
        self._gc_pending(pending_name)
        result["pending_rows"] = n_held
        result["held_batch"] = bool(n_held)
        return result

    def abandon_below(self, seq: int) -> dict:
        """Move the fence past holes that will never be refetched:
        declare every MISSING position below ``seq`` resolved. The
        held events we do have below ``seq`` are applied now (giving
        up on a hole must not discard the data around it); pending
        rows at/past ``seq`` stay held behind their own next gap. The
        apply reuses the exactly-once batch-id machinery
        (``abandon-<old>-<seq>``), so a crash-redo is skipped by the
        sink's batch log before the state advances."""
        state = self._state()
        nxt = state["next_seq"]
        if nxt is not None and seq <= nxt:
            return state
        s = F.col(self.seq_col)
        pending = self._pending_df(state)
        applied = 0
        pending_name = state.get("pending")
        if pending is not None:
            lower = pending.filter(s < seq).localCheckpoint()
            applied = lower.count()
            if applied:
                apply_events_batch(
                    lower,
                    self.sink,
                    f"abandon-{nxt}-{seq}",
                    evolve=self.evolve,
                    parse_fn=self.parse_fn,
                )
                upper = pending.filter(s >= seq)
                if upper.isEmpty():
                    pending_name = None
                else:
                    pending_name = f"pending-abandon-{seq}.parquet"
                    upper.write.mode("overwrite").parquet(
                        os.path.join(self.work_dir, pending_name)
                    )
        self._write_state({"next_seq": seq, "pending": pending_name})
        self._gc_pending(pending_name)
        out = self._state()
        out["applied_rows"] = applied
        return out
