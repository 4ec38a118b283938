"""Runtime activation of the ``google.protobuf`` shim for state API v2.

``transformWithStateInPandas`` needs protobuf in TWO processes: the driver
(plan construction imports ``StateMessage_pb2``) and every Python worker
(the state client speaks protobuf to the JVM state server). This module
handles both:

  * driver: put ``_vendor/`` on ``sys.path`` so ``import google.protobuf``
    resolves to the aliasing shim (see ``_vendor/google/protobuf``);
  * workers: ship the shim package via ``SparkContext.addPyFile`` — the
    worker inserts the shipped zip at the head of its own ``sys.path``, so
    the import works there too without any PYTHONPATH coordination (which
    could not be changed after the JVM started anyway).

``activate`` is idempotent and returns False (never raises) when no
protobuf runtime can be arranged — callers fall back to the v1 API.
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile

_VENDOR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_vendor"
)
_SHIPPED_FLAG = "_spark_graft_protobuf_shim_shipped"


def _driver_import_ok() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _shim_zip() -> str:
    """Package ``_vendor/google`` as a zip for addPyFile (rebuilt only if
    missing; contents are two small __init__ files)."""
    path = os.path.join(tempfile.gettempdir(), "spark_graft_protobuf_shim.zip")
    if not os.path.exists(path):
        with zipfile.ZipFile(path, "w") as zf:
            for root, _dirs, files in os.walk(os.path.join(_VENDOR_DIR, "google")):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, _VENDOR_DIR))
    return path


def ensure_jvm_pythonpath() -> None:
    """Put the shim's vendor dir on ``PYTHONPATH`` so that Python
    subprocesses the JVM spawns (the transformWithState DRIVER-side worker
    in particular — it never sees addPyFile paths) can import
    ``google.protobuf``. Must run BEFORE the JVM launches; harmless
    afterwards (the capability gate re-checks against the JVM's actual
    env). No-op when a real protobuf is installed."""
    try:
        import importlib.metadata

        importlib.metadata.distribution("protobuf")
        return  # a real protobuf distribution is installed
    except Exception:
        pass
    current = os.environ.get("PYTHONPATH", "")
    if _VENDOR_DIR not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            current + os.pathsep + _VENDOR_DIR if current else _VENDOR_DIR
        )


def _jvm_worker_import_ok(spark) -> bool:
    """Can a FRESH python process, launched with the PYTHONPATH the JVM
    will hand its driver-side state worker, import google.protobuf?
    Cached per SparkContext (one subprocess probe)."""
    sc = spark.sparkContext
    cached = getattr(sc, "_spark_graft_pb_jvm_ok", None)
    if cached is not None:
        return cached
    import subprocess

    try:
        jvm_pp = sc._jvm.java.lang.System.getenv("PYTHONPATH") or ""
    except Exception:
        jvm_pp = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ)
    env["PYTHONPATH"] = jvm_pp
    ok = (
        subprocess.run(
            [sys.executable, "-c", "import google.protobuf"],
            env=env,
            capture_output=True,
            timeout=60,
        ).returncode
        == 0
    )
    sc._spark_graft_pb_jvm_ok = ok
    return ok


def activate(spark=None) -> bool:
    """Make ``google.protobuf`` importable on the driver (installing the
    shim if needed) and, when a session is given, on its workers too.
    Returns whether the v2 state API can run."""
    used_shim = False
    if not _driver_import_ok():
        if _VENDOR_DIR not in sys.path:
            sys.path.append(_VENDOR_DIR)
        if not _driver_import_ok():
            return False
        used_shim = True
    else:
        # the import may already BE the shim from an earlier activate():
        # the aliased module keeps its vendored dotted name
        import google.protobuf as _pb

        used_shim = _pb.__name__ != "google.protobuf"
    if spark is not None and used_shim:
        # ship the shim to executor workers ONLY when the driver itself
        # needed it — a real protobuf install must never be shadowed
        sc = spark.sparkContext
        if not getattr(sc, _SHIPPED_FLAG, False):
            try:
                sc.addPyFile(_shim_zip())
            except Exception:
                return False
            setattr(sc, _SHIPPED_FLAG, True)
        # the transformWithState DRIVER-side worker is a separate process
        # that sees only the JVM's PYTHONPATH (set before JVM launch by
        # ensure_jvm_pythonpath) — a session whose JVM predates the shim
        # cannot run v2, and must say so rather than crash mid-query
        if not _jvm_worker_import_ok(spark):
            return False
    return True
