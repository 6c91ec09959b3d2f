"""Streaming column-level LWW (``streaming.patch_state``): per-key
resolved patched rows maintained in the state store across
micro-batches and checkpoint restarts, pinned against the batch
``lww_patch`` operator over the same raw history — including
out-of-order delivery ACROSS micro-batches, which the commutative /
associative column-wise-max algebra must absorb exactly like the
patch-mode sink does."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from embulk_util_json_spark.operators.lww import lww_patch
from embulk_util_json_spark.streaming.patch_state import resolved_patch_state

KEYS = ["conv_id", "turn_idx"]
ORDER = ["ts", "seq"]
PATCH = ["role", "text", "tool"]
M = "__unchanged__"

_STREAM_DDL = (
    "conv_id string, turn_idx int, ts timestamp, seq long, "
    "op string, role string, text string, tool string"
)


def _rows_table(rows):
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "ts", "seq", "op", *PATCH]
    )
    df["ts"] = pd.to_datetime(df["ts"], unit="s").astype("datetime64[us]")
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return pa.Table.from_pandas(df, preserve_index=False)


def _batch1():
    return [
        ("c1", 0, 100, 10, "insert", "user", "hello", "search"),
        ("c1", 0, 110, 11, "update", M, "hello v2", M),
        ("c1", 1, 100, 12, "insert", "asst", "hi", None),
        ("c2", 0, 100, 13, "insert", "user", "yo", "browser"),
        ("c2", 0, 120, 14, "delete", None, None, None),
    ]


def _batch2():
    """Arrives AFTER batch1 but carries mostly OLDER positions."""
    return [
        # older update: its text loses to seq 11, but its tool write
        # is the latest-ever tool write for (c1, 0) → wins that column
        ("c1", 0, 105, 20, "update", M, "stale text", "calc"),
        # revival patch after the c2 delete: carry-forward through the
        # tombstone revives pre-delete tool
        ("c2", 0, 130, 21, "update", M, "revived", M),
        # brand-new key, explicit NULL tool (= SET NULL, marker given)
        ("c3", 2, 100, 22, "insert", "user", "new", None),
    ]


def _oracle(spark, rows):
    df = spark.createDataFrame(_rows_table(rows).to_pylist(), _STREAM_DDL)
    out = lww_patch(
        df, KEYS, ORDER, PATCH, unchanged_marker=M,
        absent_if=F.col("op") == "delete",
    )
    return {
        (r.conv_id, r.turn_idx): (r.op, r.role, r.text, r.tool)
        for r in out.collect()
    }


def test_patch_state_across_batches_and_out_of_order(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ck")

    def run():
        stream = spark.readStream.schema(_STREAM_DDL).parquet(str(src))
        resolved = resolved_patch_state(
            stream, PATCH, keys=KEYS, order_cols=ORDER, unchanged_marker=M
        )
        q = (
            resolved.writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    pq.write_table(_rows_table(_batch1()), str(src / "p0.parquet"))
    run()
    got1 = {
        (r.conv_id, r.turn_idx): (r.op, r.role, r.text, r.tool)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got1 == _oracle(spark, _batch1())
    # the tombstoned key IS emitted (op='delete'); consumers filter
    assert got1[("c2", 0)][0] == "delete"

    files_before = set(os.listdir(out))
    pq.write_table(_rows_table(_batch2()), str(src / "p1.parquet"))
    run()  # state resumes from checkpoint
    new_files = [
        str(out / f)
        for f in set(os.listdir(out)) - files_before
        if f.endswith(".parquet")
    ]
    got2 = {
        (r.conv_id, r.turn_idx): (r.op, r.role, r.text, r.tool)
        for r in spark.read.parquet(*new_files).collect()
    }
    full = _oracle(spark, _batch1() + _batch2())
    touched = {("c1", 0), ("c2", 0), ("c3", 2)}
    assert set(got2) == touched  # only touched keys re-emit
    for k in touched:
        assert got2[k] == full[k]
    # the specific algebra: older batch-2 positions lose where a newer
    # write exists, win where the column was never written later
    assert got2[("c1", 0)] == ("update", "user", "hello v2", "calc")
    assert got2[("c2", 0)] == ("update", "user", "revived", "browser")
    assert got2[("c3", 2)] == ("insert", "user", "new", None)


def test_patch_state_rejects_bad_config(spark, tmp_path):
    stream = spark.readStream.schema(_STREAM_DDL).parquet(str(tmp_path))
    try:
        resolved_patch_state(stream, ["nope"], keys=KEYS, order_cols=ORDER)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "absent" in str(e)


def test_patch_state_ttl_evicts_idle_keys(spark, tmp_path):
    """state_ttl_sec bounds the store: a key whose latest event time
    falls TTL behind the watermark is evicted (event-time — the same
    stream evicts the same keys on any replay), and a LATER patch to
    it resolves with NO carry-forward — the documented cache
    trade-off; the lake sink keeps the authoritative history."""
    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ck")

    def run():
        stream = spark.readStream.schema(_STREAM_DDL).parquet(str(src))
        resolved = resolved_patch_state(
            stream, PATCH, keys=KEYS, order_cols=ORDER,
            unchanged_marker=M, state_ttl_sec=50.0,
        )
        q = (
            resolved.writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    pq.write_table(
        _rows_table([("c1", 0, 100, 1, "insert", "user", "hello", "search")]),
        str(src / "p0.parquet"),
    )
    run()
    # an unrelated batch advances the watermark to ts=200 — past c1's
    # deadline (100 + 50) → c1 evicts on the watermark tick
    pq.write_table(
        _rows_table([("zz", 9, 200, 2, "insert", "user", "other", "t")]),
        str(src / "p1.parquet"),
    )
    run()
    files_before = set(os.listdir(out))
    # a post-eviction patch: text carries, role/tool DON'T come back
    pq.write_table(
        _rows_table([("c1", 0, 300, 3, "update", M, "late patch", M)]),
        str(src / "p2.parquet"),
    )
    run()
    new_files = [
        str(out / f)
        for f in set(os.listdir(out)) - files_before
        if f.endswith(".parquet")
    ]
    got = {
        (r.conv_id, r.turn_idx): (r.op, r.role, r.text, r.tool)
        for r in spark.read.parquet(*new_files).collect()
    }
    assert got == {("c1", 0): ("update", None, "late patch", None)}


def test_patch_state_ttl_validation(spark, tmp_path):
    """state_ttl_sec=0 must raise, not silently disable eviction (the
    falsy-zero trap would reintroduce unbounded state growth)."""
    import pytest as _pytest

    stream = spark.readStream.schema(_STREAM_DDL).parquet(str(tmp_path))
    with _pytest.raises(ValueError, match="must be > 0"):
        resolved_patch_state(
            stream, PATCH, keys=KEYS, order_cols=ORDER, state_ttl_sec=0.0
        )
    with _pytest.raises(ValueError, match="must be > 0"):
        resolved_patch_state(
            stream, PATCH, keys=KEYS, order_cols=ORDER, state_ttl_sec=-5
        )
