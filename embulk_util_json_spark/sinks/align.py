"""Watermark-aligned reads across independently-progressing tables.

Two tables fed by INDEPENDENT change streams (different Kafka topics,
different shards — not the single-log case ``sinks/txn`` solves) have
no shared transaction to pin a consistent snapshot to. What they do
share is event time. This module aligns them at a common event-time
watermark:

* ``event_time_frontier(sink, version)`` — the applied frontier of a
  committed version: the max upper bound over the version's ts zone
  maps (``file_stats``, recorded at every write from parquet footers).
  A pure manifest read — no data scanned, any historical version.
* ``aligned_versions(sinks)`` — T = min over tables of their CURRENT
  frontiers; each table resolves to its latest committed version whose
  frontier ≤ T.
* ``aligned_read(sinks)`` — those versions as DataFrames: every
  returned row has ``ts ≤ T``, so a cross-table join sees no table
  "from the future" relative to another.

Contract and its limits (stated, not hidden): alignment guarantees
"contains ONLY events at/before T". It guarantees "contains ALL of
them" exactly when each stream commits in event-time order — the CDC
shape, and what the fencing machinery (``pipeline/disorder``,
``streaming/fenced``) exists to enforce upstream. Under out-of-order
commits a later version may still add an event ≤ T; no alignment
scheme can fix that retroactively — hold the frontier back with the
fence instead.

Frontier integrity: a referenced data path with no recorded ts stat
makes the frontier unknowable (its rows could be later than every
statted one), so ``event_time_frontier`` raises rather than silently
under-reporting — an under-reported T would let the OTHER tables serve
future rows. Fail-loud = aligned.

Scale: frontiers are manifest metadata (O(paths) dict scan per
version, zero Spark jobs); the version walk inspects newest-first and
stops at the first hit, so a lagging table pays O(versions behind),
not O(history).

Reference anchor: the reference parses one stream (JsonParser.java);
coordinating MANY applied streams is host-pipeline scope this engine
owns (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .snapshot import ParquetSnapshotSink


def event_time_frontier(
    sink: ParquetSnapshotSink, version: int | None = None
) -> int | None:
    """Applied event-time frontier (epoch µs) of a committed version —
    ``None`` for an empty table. Raises if any referenced path lacks a
    ts zone map (see module docstring)."""
    v = sink.current_version() if version is None else int(version)
    if v <= 0:
        return None
    m = sink.manifest_at(v)
    if not m or not m["buckets"]:
        return None
    referenced = [p for ps in m["buckets"].values() for p in ps]
    fs = m.get("file_stats", {})
    missing = [p for p in referenced if p not in fs]
    if missing:
        raise ValueError(
            f"version {v}: {len(missing)} referenced path(s) carry no ts "
            f"zone map (e.g. {missing[0]!r}) — frontier unknowable, "
            f"alignment would be unsound"
        )
    return max(fs[p][1] for p in referenced)


def aligned_versions(
    sinks: dict[str, ParquetSnapshotSink],
) -> tuple[dict[str, int], int | None]:
    """Per-table versions aligned at the common watermark.

    Returns ``({name: version}, T_us)``; version 0 = the table has no
    committed state at/before T (serve it empty). ``T_us`` is ``None``
    only when some table has never committed anything — there is no
    common watermark yet, and every table resolves to version 0."""
    frontiers = {n: event_time_frontier(s) for n, s in sinks.items()}
    if any(f is None for f in frontiers.values()):
        return {n: 0 for n in sinks}, None
    t = min(frontiers.values())
    out: dict[str, int] = {}
    for n, s in sinks.items():
        v = s.current_version()
        while v > 0:
            f = event_time_frontier(s, v)
            if f is None or f <= t:
                break
            v -= 1
        out[n] = v
    return out, t


def aligned_read(
    sinks: dict[str, ParquetSnapshotSink],
) -> dict[str, DataFrame]:
    """Each table's state at its aligned version (empty frame at
    version 0) — every row in every returned frame has ``ts ≤ T``."""
    versions, _ = aligned_versions(sinks)
    return {
        n: (
            sinks[n].read(at_version=versions[n])
            if versions[n] > 0
            else sinks[n]._empty_state_frame()
        )
        for n in sinks
    }
