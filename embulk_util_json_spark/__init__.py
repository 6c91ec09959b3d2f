"""embulk_util_json_spark — a from-scratch, PySpark-native CDC/ingest engine.

Plays the role `embulk/embulk-util-json` plays inside an Embulk ingest
pipeline — JSON-pointer column capture, root re-pointing and array
flattening over streams of JSON change events — re-expressed as
vectorized Spark operations, plus the downstream half of the pipeline
(last-writer-wins dedupe, exactly-once MERGE into a lake table of
conversation transcripts, schema evolution, checkpointed replay).

Architecture (Spark-first, NOT a port):

- ``plans``      — driver-side compilation: RFC 6901 pointers, the
                   shared-prefix pointer tree, CaptureSpec strategy
                   selection (mirrors CapturingPointers.java:145-165
                   in spirit: json_tuple fast path / pruned from_json /
                   Arrow-vectorized parity UDF).
- ``functions``  — pure-Python JSON value engine used *inside* Arrow
                   batches (parity semantics: duplicate keys, literal
                   preservation, number fallbacks) + column function
                   library (text quality, lang id, token counts).
- ``operators``  — DataFrame-level operators: capture, flatten,
                   last-writer-wins, dedup (exact/minhash/simhash),
                   similarity search, multimodal plumbing.
- ``sources``    — change-event readers + deterministic generators.
- ``sinks``      — lake sinks: ParquetSnapshotSink (bucketed,
                   manifest-committed, exactly-once) and an Iceberg
                   MERGE INTO sink gated on the runtime jar.
- ``streaming``  — batch replay + Structured Streaming foreachBatch
                   runners with checkpoint resume.

All heavy lifting is declarative DataFrame API so Catalyst handles
pushdown, pruning, join strategy and AQE; Python appears only in
driver-side planning and Arrow-batched UDFs (never per-row).
"""

__version__ = "0.1.0"

from .ship import register_self_contained_udfs

# UDF closures must not depend on the worker's import path: tests,
# the verify harness and notebooks may run from any CWD; real clusters
# use spark-submit --py-files (ship.make_pyfiles_zip).
register_self_contained_udfs()

