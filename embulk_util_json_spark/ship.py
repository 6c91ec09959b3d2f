"""Deployment helpers.

On a real cluster the engine ships via ``spark-submit --py-files
$(make_pyfiles_zip())`` (the north-rule deployment mode). For
driver-embedded use (tests, the driver's verify harness, notebooks
run from arbitrary CWDs) we additionally register the pure-Python
engine modules for cloudpickle *by-value* serialization, so every
Arrow-UDF closure is self-contained and Python workers never need the
package importable on their own path.
"""

from __future__ import annotations

import os
import zipfile

_REGISTERED = False


def register_self_contained_udfs() -> None:
    """Make UDF closures carry the engine code by value (idempotent)."""
    global _REGISTERED
    if _REGISTERED:
        return
    try:
        from pyspark import cloudpickle

        from .functions import json_values
        from .operators import capture
        from .pipeline import multimodal, similarity
        from .plans import capture_spec, pointer
        from .streaming import patch_state, stateful

        for mod in (
            json_values,
            pointer,
            capture_spec,
            capture,
            multimodal,
            similarity,
            stateful,
            patch_state,
        ):
            cloudpickle.register_pickle_by_value(mod)
        _REGISTERED = True
    except Exception:  # pragma: no cover - non-Spark contexts
        pass


def make_pyfiles_zip(out_path: str = "/tmp/embulk_util_json_spark.zip") -> str:
    """Zip the package for ``spark-submit --py-files`` /
    ``sparkContext.addPyFile``. Returns the zip path."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return out_path
