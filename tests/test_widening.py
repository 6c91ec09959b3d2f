"""Type-widening schema evolution: an upstream ALTER COLUMN that
widens a numeric column (int→bigint, float→double — the Debezium
``ALTER TABLE`` events a long-lived CDC feed eventually carries) must
keep the table readable IN PLACE: old narrow files are read directly
under the widened schema (Spark 4 parquet widening promotions), never
rewritten, and every read path — chain merge, prune-miss empty frame,
compaction — agrees on the wide type.

Exactness: the promotion is lossless (int32 ⊂ int64; float/int32 ⊂
double's 53-bit mantissa), so the widened read yields bit-equal
values; long↔double is NOT offered (not lossless) and stays a
conflict. Reference anchor: the number-semantics promotion the
reference applies within a document (JsonParserDelegate.java knobs)
lifted across stored history.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink

BIG = 3_000_000_000  # > 2^31: only representable after widening


def _rows(spark, lo, hi, score_type="int", score_of=None, seq_off=0):
    score_of = score_of or (lambda i: i * 10)
    # seq_off orders overlapping batches: later feeds carry later seqs,
    # so LWW winners are deterministic (no (ts, seq) ties)
    out = [
        (
            f"c{i % 8}",
            i % 4,
            "assistant",
            f"text {i}",
            score_of(i),
            datetime.datetime(2025, 1, 1, 0, 0, i % 3600),
            "upsert",
            i + seq_off,
        )
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        out,
        "conv_id string, turn_idx int, role string, text string, "
        f"score {score_type}, ts timestamp, op string, seq long",
    )


def _mk(spark, tmp_path, mode):
    return ParquetSnapshotSink(
        spark,
        str(tmp_path / f"t_{mode}"),
        num_buckets=4,
        keys=["conv_id", "turn_idx"],
        order_cols=["ts", "seq"],
        mode=mode,
        stats_cols=["score"],
    )


def _oracle(*frames):
    """LWW winners over the union, computed wide from the start."""
    u = None
    for f in frames:
        f = f.withColumn("score", F.col("score").cast("long"))
        u = f if u is None else u.unionByName(f)
    return sorted(
        map(
            tuple,
            u.groupBy("conv_id", "turn_idx")
            .agg(
                F.max_by(
                    F.struct("role", "text", "score", "ts"),
                    F.struct("ts", "seq"),
                ).alias("s")
            )
            .select("conv_id", "turn_idx", "s.*")
            .collect(),
        )
    )


@pytest.mark.parametrize("mode", ["mor", "mow"])
def test_int_to_long_widening_roundtrip(spark, tmp_path, mode):
    sink = _mk(spark, tmp_path, mode)
    b0 = _rows(spark, 0, 40, "int").localCheckpoint()
    b1 = _rows(spark, 20, 60, "long", lambda i: BIG + i, seq_off=1000).localCheckpoint()
    sink.apply(b0, "b0")
    sink.apply(b1, "b1")

    got = sink.read()
    assert dict(got.dtypes)["score"] == "bigint"
    rows = sorted(
        map(tuple, got.select("conv_id", "turn_idx", "role", "text", "score", "ts").collect())
    )
    assert rows == _oracle(b0, b1)
    # widened values actually exceed int32
    assert max(r[4] for r in rows) > 2**31


def test_widened_prune_miss_carries_wide_schema(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 20, "int").localCheckpoint(), "b0")
    sink.apply(
        _rows(spark, 0, 20, "long", lambda i: BIG + i, seq_off=1000).localCheckpoint(), "b1"
    )
    miss = sink.read(key_eq={"conv_id": "nope"})
    assert dict(miss.dtypes)["score"] == "bigint"
    assert miss.count() == 0


def test_compaction_after_widening_is_identity(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    b0 = _rows(spark, 0, 40, "int").localCheckpoint()
    b1 = _rows(spark, 20, 60, "long", lambda i: BIG + i, seq_off=1000).localCheckpoint()
    sink.apply(b0, "b0")
    sink.apply(b1, "b1")
    before = sorted(map(tuple, sink.read().collect()))
    sink.compact()
    after_df = sink.read()
    assert dict(after_df.dtypes)["score"] == "bigint"
    assert sorted(map(tuple, after_df.collect())) == before


def test_float_to_double_widening(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(
        _rows(spark, 0, 20, "float", lambda i: float(i) + 0.5).localCheckpoint(),
        "b0",
    )
    sink.apply(
        _rows(spark, 10, 30, "double", lambda i: float(i) + 0.25, seq_off=1000).localCheckpoint(),
        "b1",
    )
    got = sink.read()
    assert dict(got.dtypes)["score"] == "double"
    # .5/.25 fractions are exact in both widths: winners value-stable.
    # b1 (seq_off) wins every overlapping key → some .25 survivors.
    scores = sorted(r.score for r in got.select("score").collect())
    assert any(s % 1 == 0.25 for s in scores)
    assert all(s % 1 in (0.25, 0.5) for s in scores)


def test_non_widening_conflict_still_fails(spark, tmp_path):
    """string vs int is foreign data, not evolution: the driver-side
    merge refuses, the distributed fallback fails — loud, not silent."""
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 10, "int").localCheckpoint(), "b0")
    sink.apply(_rows(spark, 10, 20, "string", lambda i: str(i), seq_off=1000).localCheckpoint(), "b1")
    with pytest.raises(Exception):
        sink.read().collect()


def test_long_double_stays_a_conflict(spark, tmp_path):
    """bigint↔double would be LOSSY above 2^53 — deliberately not a
    widening pair; reads fail loudly instead of silently rounding."""
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 10, "long", lambda i: BIG + i).localCheckpoint(), "b0")
    sink.apply(
        _rows(spark, 10, 20, "double", lambda i: float(i), seq_off=1000).localCheckpoint(), "b1"
    )
    with pytest.raises(Exception):
        sink.read().collect()
