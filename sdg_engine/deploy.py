"""Packaging for executors (north rule: "packaged for spark-submit
--py-files").

Engine pandas UDFs (geocode, PIP, codecs) are pickled BY REFERENCE to
the ``sdg_engine`` module, so executor Python workers must be able to
import it.  On a real cluster that is ``spark-submit --py-files
sdg_engine.zip``; for driver-owned sessions (the correctness harness)
:func:`ensure_pyfiles` builds the zip once per process and registers
it via ``SparkContext.addPyFile`` — idempotent and safe to call from
every query builder.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_ZIP_PATH: list[str | None] = [None]
_ADDED_APPS: set[str] = set()


def build_pyfiles_zip() -> str:
    """Zip the sdg_engine package (pure .py) into a temp file, once."""
    if _ZIP_PATH[0] and os.path.exists(_ZIP_PATH[0]):
        return _ZIP_PATH[0]
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, path = tempfile.mkstemp(prefix="sdg_engine_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        "sdg_engine", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    _ZIP_PATH[0] = path
    return path


def ensure_pyfiles(spark) -> None:
    """Register the engine zip with this session's SparkContext (once)."""
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _ADDED_APPS:
        return
    try:
        sc.addPyFile(build_pyfiles_zip())
    except Exception:  # noqa: BLE001 — already registered under this name
        pass
    _ADDED_APPS.add(app)
