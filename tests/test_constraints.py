"""Table CHECK constraints (Delta `ALTER TABLE ADD CONSTRAINT` /
SQL-standard CHECK semantics) enforced at apply.

Semantics pinned here:
- `add_constraint(name, expr)` is a METADATA-ONLY commit; existing
  data must already satisfy the predicate (validated with one scan at
  DDL time, like Delta).
- Enforcement is per BATCH, strict, and PRE-STAGING: a violating batch
  is refused whole before any file is written, the version does not
  advance, and the batch id is not recorded — the producer fixes and
  resubmits under the same id (exactly-once intact).
- SQL CHECK null semantics: a predicate evaluating to NULL passes;
  only FALSE violates. Delete tombstones are exempt (their payload is
  not written as state).
- A batch that does not carry a referenced column cannot introduce a
  violation (row mode: the merge fills NULL, which passes; patch mode:
  absence means "don't touch") — such batches skip that constraint.

Reference anchor: the reference validates at the value layer (invalid
JSON → row-skippable JsonParseException, JsonParseException.java:24-43);
constraints lift validation to declarative table predicates.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink


def _rows(spark, lo, hi, null_text_every=None):
    out = []
    for i in range(lo, hi):
        text = f"text {i}"
        if null_text_every and i % null_text_every == 0:
            text = None
        out.append(
            (
                f"c{i % 6}",
                i % 4,
                "assistant",
                text,
                datetime.datetime(2025, 1, 1)
                + datetime.timedelta(seconds=i % 3600),
                "upsert",
                i,
            )
        )
    return spark.createDataFrame(
        out,
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, op string, seq long",
    )


def _mk(spark, tmp_path, mode="mor", name="t", **kw):
    return ParquetSnapshotSink(
        spark,
        str(tmp_path / f"{name}_{mode}"),
        num_buckets=4,
        keys=["conv_id", "turn_idx"],
        order_cols=["ts", "seq"],
        mode=mode,
        **kw,
    )


@pytest.mark.parametrize("mode", ["mor", "mow"])
def test_violating_batch_refused_whole_then_fixed_resubmit(
    spark, tmp_path, mode
):
    sink = _mk(spark, tmp_path, mode)
    sink.apply(_rows(spark, 0, 40), "b0")
    sink.add_constraint("text_present", "text IS NOT NULL")
    v0 = sink.current_version()
    bad = _rows(spark, 100, 140, null_text_every=7)
    with pytest.raises(ValueError, match="text_present"):
        sink.apply(bad, "b1")
    # nothing staged, version unchanged, batch id NOT consumed
    assert sink.current_version() == v0
    assert "b1" not in sink.current_manifest()["batch_ids"]
    fixed = bad.withColumn("text", F.coalesce("text", F.lit("REDACTED")))
    r = sink.apply(fixed, "b1")
    assert not r.get("skipped")
    out = sink.read()
    assert out.filter(F.col("text").isNull()).count() == 0
    assert out.filter(F.col("text") == "REDACTED").count() > 0


def test_add_constraint_validates_existing_data(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 40, null_text_every=5), "b0")
    with pytest.raises(ValueError, match="existing"):
        sink.add_constraint("text_present", "text IS NOT NULL")
    # constraint NOT recorded after the failed add
    assert "text_present" not in (
        sink.current_manifest().get("constraints") or {}
    )
    # a satisfiable one lands
    sink.add_constraint("turn_bounds", "turn_idx BETWEEN 0 AND 100")
    assert "turn_bounds" in sink.current_manifest()["constraints"]


def test_null_predicate_passes_and_deletes_exempt(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 20), "b0")
    # NULL seq -> NULL predicate -> passes (SQL CHECK semantics)
    sink.add_constraint("seq_pos", "seq > 0")
    nulls = _rows(spark, 100, 110).withColumn(
        "seq", F.lit(None).cast("long")
    )
    # order column nullable batch: seq NULL passes the check
    sink.apply(nulls.withColumn("seq", F.lit(None).cast("long")), "b1")
    # delete tombstones with violating payload are exempt
    sink.add_constraint("text_present", "text IS NOT NULL")
    dels = (
        _rows(spark, 0, 10)
        .withColumn("op", F.lit("delete"))
        .withColumn("text", F.lit(None).cast("string"))
        .withColumn("seq", F.col("seq") + 1000)
    )
    sink.apply(dels, "b2")
    assert sink.read().filter(F.col("conv_id") == "c0").count() < 20


def test_absent_column_batch_skips_constraint(spark, tmp_path):
    # patch mode: a sparse batch not carrying the constrained column
    # cannot violate it
    sink = _mk(
        spark, tmp_path, "mor", name="patch",
        patch_cols=["role", "text"],
    )
    sink.apply(_rows(spark, 0, 20), "b0")
    sink.add_constraint("text_present", "text IS NOT NULL")
    sparse = _rows(spark, 100, 110).drop("text")
    sink.apply(sparse, "b1")  # must not raise
    assert sink.read().filter(F.col("text").isNull()).count() == 0


def test_drop_constraint_and_validation(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    with pytest.raises(ValueError, match="non-empty"):
        sink.add_constraint("x", "1 = 1")
    sink.apply(_rows(spark, 0, 20), "b0")
    with pytest.raises(ValueError, match="invalid constraint name"):
        sink.add_constraint("bad name!", "1 = 1")
    with pytest.raises(Exception):
        sink.add_constraint("bad_expr", "no_such_col >>> 1")
    sink.add_constraint("text_present", "text IS NOT NULL")
    with pytest.raises(ValueError, match="already"):
        sink.add_constraint("text_present", "text IS NOT NULL")
    sink.drop_constraint("text_present")
    with pytest.raises(ValueError, match="no such constraint"):
        sink.drop_constraint("text_present")
    # violating batch passes after the drop
    sink.apply(_rows(spark, 100, 120, null_text_every=3), "b1")
    assert sink.read().filter(F.col("text").isNull()).count() > 0


def test_constraint_survives_new_handle_and_rollback(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 20), "b0")
    v_pre = sink.current_version()
    sink.add_constraint("text_present", "text IS NOT NULL")
    # fresh handle re-adopts the constraint from the manifest
    sink2 = _mk(spark, tmp_path, "mor")
    with pytest.raises(ValueError, match="text_present"):
        sink2.apply(_rows(spark, 100, 120, null_text_every=3), "b1")
    # rollback across the DDL removes the constraint
    sink.rollback(v_pre)
    sink3 = _mk(spark, tmp_path, "mor")
    sink3.apply(_rows(spark, 100, 120, null_text_every=3), "b1")
    assert sink3.read().filter(F.col("text").isNull()).count() > 0


def test_constraint_on_renamed_column_speaks_logical_names(spark, tmp_path):
    sink = _mk(spark, tmp_path, "mor")
    sink.apply(_rows(spark, 0, 20), "b0")
    sink.rename_column("text", "body")
    sink.add_constraint("body_present", "body IS NOT NULL")
    bad = _rows(spark, 100, 120, null_text_every=3).withColumnRenamed(
        "text", "body"
    )
    with pytest.raises(ValueError, match="body_present"):
        sink.apply(bad, "b1")
    good = bad.withColumn("body", F.coalesce("body", F.lit("x")))
    sink.apply(good, "b1")
    assert sink.read().filter(F.col("body").isNull()).count() == 0
