"""Multi-writer optimistic concurrency, end to end.

Round-4 pinned the stale-handle re-adopt unit behavior; this suite
races TWO live sink handles (plus concurrent maintenance) on ONE
table and asserts the serializable outcome: final state equals the
sequential LWW oracle over the union of both writers' batches, no
batch id is lost, and losing commit attempts leave only unreferenced
garbage that vacuum reclaims.

The enabling invariants under test:
- manifest commits are atomic via os.link (loser gets
  ConcurrentCommitError and retries against the re-read log);
- every commit ATTEMPT stages into its own uniquely-named data
  directory, so a loser's overwrite can never clobber a winner's
  committed files (the Iceberg unique-filename discipline);
- apply_with_retry re-reads the manifest per attempt, so a retry
  merges against the competing writer's committed state;
- a lost auto-compaction race never surfaces as an apply failure.
"""

import datetime
import threading

from pyspark.sql import functions as F

from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink


def _events_df(spark, n=600, convs=11):
    rows = [
        (
            f"c{i % convs}",
            i % 7,
            f"r{i % 3}",
            f"t{i}",
            None if i % 4 else "tool",
            datetime.datetime(2025, 1, 1, 0, i % 60, (i * 7) % 60),
            "delete" if i % 13 == 5 else "upsert",
            i,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, op string, seq long",
    )


def _lww_state(df):
    w = (
        df.groupBy("conv_id", "turn_idx")
        .agg(
            F.max_by(
                F.struct("op", "role", "text", "tool", "ts"),
                F.struct("ts", "seq"),
            ).alias("s")
        )
        .select("conv_id", "turn_idx", "s.*")
    )
    return sorted(
        map(tuple, w.filter(F.col("op") != "delete").drop("op").collect())
    )


def test_two_writers_with_maintenance_serialize(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _events_df(spark).localCheckpoint()
    n_batches = 24
    slices = [
        df.filter((F.col("seq") % n_batches) == i) for i in range(n_batches)
    ]

    a = ParquetSnapshotSink(spark, root, num_buckets=4, mode="mor",
                            compact_every=4)
    b = ParquetSnapshotSink(spark, root, num_buckets=4, mode="mor",
                            compact_every=4)
    start = threading.Barrier(3)
    errors: list[BaseException] = []

    def writer(sink, ids):
        try:
            start.wait()
            for i in ids:
                sink.apply_with_retry(slices[i], f"b{i}", max_retries=50)
        except BaseException as e:  # noqa: BLE001 - surfaced below
            errors.append(e)

    def maintenance():
        from embulk_util_json_spark.sinks.snapshot import ConcurrentCommitError

        try:
            start.wait()
            for k in range(6):
                try:
                    if k == 3:
                        b.rebucket(8)
                    else:
                        a.compact(drop_tombstones=False)
                except ConcurrentCommitError:
                    continue  # lost the slot; next loop retries
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=writer, args=(a, range(0, n_batches, 2))),
        threading.Thread(target=writer, args=(b, range(1, n_batches, 2))),
        threading.Thread(target=maintenance),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors

    # every batch id committed exactly once, none lost
    reader = ParquetSnapshotSink(spark, root, num_buckets=4, mode="mor")
    committed = reader.applied_batch_ids()
    assert {f"b{i}" for i in range(n_batches)} <= set(committed)
    assert len(committed) == len(set(committed))

    # serializable final state == sequential whole-stream LWW oracle
    got = sorted(
        map(
            tuple,
            reader.read()
            .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
            .collect(),
        )
    )
    assert got == _lww_state(df)

    # redelivering every batch through either handle is a no-op
    r = a.apply_with_retry(slices[3], "b3", max_retries=50)
    assert r.get("skipped")

    # loser attempts left only unreferenced dirs; vacuum reclaims them
    # and the state survives
    reader.vacuum(keep_versions=1, protect_cursors=False)
    got2 = sorted(
        map(
            tuple,
            reader.read()
            .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
            .collect(),
        )
    )
    assert got2 == _lww_state(df)


def test_unique_attempt_dirs_never_collide(spark, tmp_path):
    """Two attempts at the same version stage into distinct dirs."""
    sink = ParquetSnapshotSink(spark, str(tmp_path / "u"), num_buckets=2)
    assert sink._data_rel(5) != sink._data_rel(5)
