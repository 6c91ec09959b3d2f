"""Deployment packaging: the --py-files zip must be importable on a
bare interpreter with ONLY the zip on sys.path (what a Spark executor
sees under spark-submit --py-files)."""

import os
import subprocess
import sys


def test_pyfiles_zip_standalone_import(tmp_path):
    from embulk_util_json_spark.ship import make_pyfiles_zip

    zip_path = make_pyfiles_zip(str(tmp_path / "engine.zip"))
    assert os.path.getsize(zip_path) > 10_000
    probe = (
        "import sys; sys.path = [sys.argv[1]] + "
        "[p for p in sys.path if 'repo' not in p]\n"
        "import embulk_util_json_spark\n"
        "from embulk_util_json_spark.plans.capture_spec import CaptureSpec\n"
        "from embulk_util_json_spark.functions import json_values as jv\n"
        "spec = CaptureSpec.compile(['/a/1/k', '/a/c'])\n"
        "assert spec.requires_parity_engine()\n"
        "doc = next(jv.iter_documents('{\"a\": 1}', jv.DEFAULT_OPTIONS))\n"
        "cells = jv.capture(doc, CaptureSpec.compile(['/a']).tree)\n"
        "assert jv.encode(cells[0], False) == '1'\n"
        "print('zip-import OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", probe, zip_path],
        capture_output=True, text=True, timeout=60,
        cwd=str(tmp_path),  # NOT the repo: the zip must be self-sufficient
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert out.returncode == 0, out.stderr
    assert "zip-import OK" in out.stdout


def test_spark_submit_pyfiles_e2e(tmp_path, spark):
    """The north-rule deployment mode, for real: `spark-submit
    --py-files engine.zip driver.py` in a subprocess whose only access
    to the engine is the zip — full replay → sink → final-state hash,
    compared bit-for-bit against the same pipeline run in-process."""
    import pyspark
    from pyspark.sql import functions as F

    from embulk_util_json_spark.ship import make_pyfiles_zip
    from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink
    from embulk_util_json_spark.sources.generator import ensure_events_segments
    from embulk_util_json_spark.streaming.runner import replay_segments

    spark_submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    zip_path = make_pyfiles_zip(str(tmp_path / "engine.zip"))
    driver = tmp_path / "driver.py"
    driver.write_text(
        "import os, sys\n"
        "from pyspark.sql import SparkSession, functions as F\n"
        "work = sys.argv[1]\n"
        "spark = SparkSession.builder.getOrCreate()\n"
        "from embulk_util_json_spark.sources.generator import ensure_events_segments\n"
        "from embulk_util_json_spark.sinks.snapshot import ParquetSnapshotSink\n"
        "from embulk_util_json_spark.streaming.runner import replay_segments\n"
        "seg = ensure_events_segments(os.path.join(work, 'events'), 20000,\n"
        "                             segments=4, n_convs=50, n_turns=40)\n"
        "sink = ParquetSnapshotSink(spark, os.path.join(work, 'table'),\n"
        "                           num_buckets=4, mode='mor')\n"
        "applied = replay_segments(spark, seg, sink, num_batches=2)\n"
        "df = sink.read()\n"
        "h = df.agg(F.bit_xor(F.xxhash64('conv_id', 'turn_idx', 'role',\n"
        "                                'text', 'ts'))).collect()[0][0]\n"
        "print(f'SUBMIT_OK rows={df.count()} hash={h} "
        "batches={len(applied)}')\n"
    )
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", zip_path,
            str(driver), str(tmp_path / "work"),
        ],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("SUBMIT_OK")]
    assert line, out.stdout[-2000:] + out.stderr[-2000:]

    # in-process reference with the SAME deterministic inputs
    seg = ensure_events_segments(
        str(tmp_path / "ref_events"), 20000, segments=4, n_convs=50, n_turns=40
    )
    ref_sink = ParquetSnapshotSink(
        spark, str(tmp_path / "ref_table"), num_buckets=4, mode="mor"
    )
    replay_segments(spark, seg, ref_sink, num_batches=2)
    ref = ref_sink.read()
    ref_h = ref.agg(
        F.bit_xor(F.xxhash64("conv_id", "turn_idx", "role", "text", "ts"))
    ).collect()[0][0]
    assert line[0] == f"SUBMIT_OK rows={ref.count()} hash={ref_h} batches=2"
