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
