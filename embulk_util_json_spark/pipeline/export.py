"""Train-ready shard export — the last mile of the corpus pipeline.

Dataloaders want the corpus as N similarly-sized, globally-ordered
shard files plus a manifest (file → row count) they can split across
workers. The scale-correct formulation is ``repartitionByRange`` on
the order key (sampled range boundaries, deterministic for a fixed
input) + per-shard sort — NO global single-partition sort, no
driver-side row movement; shard sizes are approximately even (range
sampling), which is what dataloader sharding actually needs.

The manifest is read from parquet footers (metadata-only, no extra
Spark job) and written as JSON next to the shards.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    order_by: list[str],
) -> dict:
    """Write ``df`` as ``n_shards`` globally-ordered parquet shards
    under ``path`` plus ``_shard_manifest.json``. Returns the manifest
    dict: total rows, per-file rows, and the order key."""
    (
        df.repartitionByRange(n_shards, *order_by)
        .sortWithinPartitions(*order_by)
        .write.mode("overwrite")
        .parquet(path)
    )
    import pyarrow.parquet as pq

    files = sorted(
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    shards = {f: pq.read_metadata(os.path.join(path, f)).num_rows for f in files}
    manifest = {
        "n_shards": len(files),
        "total_rows": sum(shards.values()),
        "order_by": list(order_by),
        "shards": shards,
    }
    with open(os.path.join(path, "_shard_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest
