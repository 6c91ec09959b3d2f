"""Event-time windowed aggregation with a watermark (late-data policy).

The exactly-once apply path deliberately does NOT watermark-drop —
late change events must still win LWW (see ``streaming.stateful``).
This module is the complementary *analytics* stream over the same
parsed change feed: per-conversation activity counts in fixed
event-time windows, where the watermark bounds state and defines the
late-data contract explicitly:

- an event later than its window but within the watermark delay is
  still counted (the window is open until the watermark passes its
  end);
- an event older than the watermark is dropped — the window it
  belongs to has already been finalized and emitted (append output
  mode emits each window exactly once, when it can no longer change,
  so any downstream sink sees immutable rows).

Scale: state is one row per (conversation, open window) — bounded by
watermark delay / window size per active conversation, partitioned by
the groupBy key across executors, checkpointed by the state store.
All aggregation is JVM-side hash aggregation; no Python in the path.

Works identically on a batch DataFrame (``withWatermark`` is a no-op
in batch; every window is "final") — the DuckDB oracle for the batch
shape is ``windowed_activity`` in ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_activity(
    changes: DataFrame,
    window_duration: str = "1 minute",
    watermark_delay: str = "10 minutes",
    slide_duration: str | None = None,
) -> DataFrame:
    """Per-conversation event-time windowed activity counts.

    ``changes``: parsed change rows (streaming or batch) with at least
    (conv_id, ts, op). Returns one row per (window, conv_id) with
    event/update/delete counts and the max turn touched.

    ``slide_duration`` < ``window_duration`` makes the windows
    SLIDING (each event lands in window/slide overlapping windows);
    default is tumbling. The session-gap third shape lives in
    ``operators.temporal.sessionize`` / ``session_window``.
    """
    win = (
        F.window("ts", window_duration, slide_duration)
        if slide_duration
        else F.window("ts", window_duration)
    )
    return (
        changes.withWatermark("ts", watermark_delay)
        .groupBy(
            win.alias("_w"),
            F.col("conv_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias(
                "n_deletes"
            ),
            F.max("turn_idx").alias("max_turn"),
        )
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            "conv_id",
            "n_events",
            "n_deletes",
            "max_turn",
        )
    )
