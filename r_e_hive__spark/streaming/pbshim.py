"""Optional protobuf enablement for transformWithStateInPandas (ST6b).

Spark's modern arbitrary-stateful API speaks a protobuf protocol between
the JVM and the Python worker (pyspark.sql.streaming.proto).  This
container ships no ``protobuf`` wheel and has no network, but the Google
Cloud SDK installed at the OS level vendors a complete pure-Python
protobuf runtime (Apache/BSD-licensed, public).  Its version (6.32.x)
trails the version PySpark's generated code was built with (6.33.0) by
one minor release, so the generated module's
``ValidateProtobufRuntimeVersion`` call rejects it — while the wire
format and the descriptor/builder APIs the state protocol actually uses
are identical (verified: full serialize/parse round-trips of the
StateMessage types).  This shim makes the vendored runtime importable
and relaxes ONLY that version gate, in both the driver process and the
Python workers:

- driver side: :func:`enable_protobuf_shim` appends the vendor path to
  ``sys.path`` (at the END — nothing else may be shadowed) and no-ops
  the validator, then proves the protocol imports;
- worker side: workers are fresh interpreters, so the patch must run at
  interpreter startup, before ``pyspark.worker``'s module-level imports.
  The standard hook for that is ``sitecustomize``: the shim prepends
  ``_pbshim_site/`` (which holds a defensive sitecustomize.py) to the
  ``PYTHONPATH`` the not-yet-started JVM will hand its workers.  This
  must therefore run BEFORE the SparkSession/JVM is created (conftest
  does; a JVM that is already running keeps its environment).

If a real ``protobuf`` wheel is installed, everything here is a no-op —
the wheel wins and no patching happens.  If neither the wheel nor the
vendor path exists, :func:`enable_protobuf_shim` returns False and the
ST6b test skips exactly as before.
"""

from __future__ import annotations

import importlib
import os
import sys

# Pure-Python protobuf runtimes vendored by OS-level SDK installs, newest
# first.  Override / extend with REHIVE_PB_VENDOR (a single path).
VENDOR_PATHS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_SITE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pbshim_site")


def _vendor_path() -> str | None:
    env = os.environ.get("REHIVE_PB_VENDOR")
    cands = (env,) if env else VENDOR_PATHS
    for c in cands:
        if c and os.path.isdir(os.path.join(c, "google", "protobuf")):
            return c
    return None


def _relax_validator() -> None:
    """No-op the gencode/runtime version gate (the ONLY patch applied)."""
    rv = importlib.import_module("google.protobuf.runtime_version")
    rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None


def _runtime_ok() -> bool:
    """True iff a REAL protobuf runtime imports.  A bare ``import
    google.protobuf`` is NOT the test: Spark workers have
    ``spark-core_*.jar`` on sys.path, and the jar's bundled
    ``google/protobuf/*.proto`` resources satisfy that import as an
    EMPTY namespace package (PEP 420) — importing an actual module
    (``descriptor``) is what proves a runtime exists."""
    try:
        importlib.import_module("google.protobuf.descriptor")
        return True
    except Exception:
        return False


def _purge_namespace_google() -> None:
    """Drop phantom ``google`` / ``google.*`` namespace modules from
    sys.modules so the NEXT import re-scans sys.path and finds the
    vendor's regular packages (a regular package always beats namespace
    portions, but a namespace module already cached in sys.modules is
    never re-resolved)."""
    for name in [n for n in sys.modules if n == "google" or n.startswith("google.")]:
        mod = sys.modules[name]
        if getattr(mod, "__file__", None) is None:  # namespace, not real
            del sys.modules[name]


def enable_protobuf_shim() -> bool:
    """Make the transformWithState protobuf protocol importable.

    Returns True when ``pyspark.sql.streaming.proto`` imports (real wheel
    or shimmed vendor runtime); False when no runtime is available.
    Idempotent; mutates ``os.environ['PYTHONPATH']`` only when the shim
    is actually needed, so a later-started JVM passes the worker-side
    sitecustomize hook through to its Python workers.
    """
    if not _runtime_ok():
        vend = _vendor_path()
        if vend is None:
            return False
        if vend not in sys.path:
            sys.path.append(vend)  # END: never shadow installed packages
        _purge_namespace_google()
        if not _runtime_ok():
            return False
        try:
            _relax_validator()
        except Exception:
            return False
        # worker-side hook: sitecustomize runs at every fresh interpreter
        # start (daemon and non-daemon worker launch paths both qualify)
        parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if _SITE_DIR not in parts:
            os.environ["PYTHONPATH"] = os.pathsep.join(
                [_SITE_DIR] + [p for p in parts if p]
            )

    try:
        importlib.import_module("pyspark.sql.streaming.proto.StateMessage_pb2")
        return True
    except Exception:
        # a real-but-older wheel trips the version gate only at gencode
        # import — same mismatch class; relax and retry once
        try:
            _relax_validator()
            importlib.import_module("pyspark.sql.streaming.proto.StateMessage_pb2")
            return True
        except Exception:
            return False
