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
StateMessage types).  The shim core lives in
``_pbshim_site/_pbshim_common.py`` (shared verbatim with the worker-side
sitecustomize hook; see its docstring for the meta-path-finder design
that guarantees no installed package is ever shadowed):

- driver side: :func:`enable_protobuf_shim` installs the finder /
  relaxes the gate HERE, then proves the protocol imports;
- worker side: workers are fresh interpreters, so the patch must run at
  interpreter startup, before ``pyspark.worker``'s module-level imports.
  The standard hook is ``sitecustomize``: when — and only when — this
  environment needs the shim (vendored runtime, or a real wheel OLDER
  than the gencode), the ``_pbshim_site/`` dir is prepended to the
  ``PYTHONPATH`` the not-yet-started JVM will hand its workers, and the
  resolved vendor path is pinned in ``REHIVE_PB_VENDOR`` so driver and
  workers can never pick different trees.  This must therefore run
  BEFORE the SparkSession/JVM is created (conftest does; a JVM that is
  already running keeps its environment).

If a modern ``protobuf`` wheel is installed, everything here is a no-op.
If no runtime exists at all, :func:`enable_protobuf_shim` returns False
and the ST6b test skips exactly as before.
"""

from __future__ import annotations

import importlib
import importlib.util
import os

_SITE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "_pbshim_site"
)


def _load_common():
    """Load the shared shim core by file path (workers import the same
    file by name off the PYTHONPATH hook — one implementation)."""
    import sys

    mod = sys.modules.get("_pbshim_common")
    if mod is not None:
        return mod
    spec = importlib.util.spec_from_file_location(
        "_pbshim_common", os.path.join(_SITE_DIR, "_pbshim_common.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_pbshim_common"] = mod
    spec.loader.exec_module(mod)
    return mod


def _gencode_imports() -> bool:
    try:
        importlib.import_module(
            "pyspark.sql.streaming.proto.StateMessage_pb2"
        )
        return True
    except Exception:
        return False


def _install_worker_hook(vendor: str | None) -> None:
    if vendor:
        os.environ["REHIVE_PB_VENDOR"] = vendor
    parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if _SITE_DIR not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join(
            [_SITE_DIR] + [p for p in parts if p]
        )


def descope_worker_hook() -> None:
    """Remove the ``_pbshim_site`` entry from the process-global
    ``PYTHONPATH`` once the JVM has started.

    The hook only has to be present in the environment at JVM launch:
    py4j's JVM child captures ``os.environ`` then, and Spark's Python
    workers inherit the *JVM's* env — so the sitecustomize keeps reaching
    every worker of the live session while unrelated child processes
    spawned afterwards (subprocess, multiprocessing) stop importing it
    (round-7 ADVICE: the process-global mutation shadowed any
    environment-provided sitecustomize well beyond the workers it
    targets).  Call after ``SparkSession`` creation; a later
    :func:`enable_protobuf_shim` before a NEW JVM re-installs the hook.
    ``REHIVE_PB_VENDOR`` is left pinned — it is shim-private and the
    driver-side finder still consults it."""
    parts = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]
    kept = [p for p in parts if p != _SITE_DIR]
    if kept:
        os.environ["PYTHONPATH"] = os.pathsep.join(kept)
    elif "PYTHONPATH" in os.environ:
        del os.environ["PYTHONPATH"]


def enable_protobuf_shim() -> bool:
    """Make the transformWithState protobuf protocol importable.

    Returns True when ``pyspark.sql.streaming.proto`` imports (real wheel
    or shimmed vendor runtime); False when no runtime is available.
    Idempotent; mutates ``os.environ`` (PYTHONPATH hook + pinned vendor)
    only when the shim is actually needed."""
    common = _load_common()
    ok, vendor_used = common.ensure_protobuf(relax=False)
    if not ok:
        return False

    if _gencode_imports():
        if vendor_used is None:
            return True  # modern real wheel: nothing to shim anywhere
        # vendored runtime happened to satisfy the gate (same version):
        # workers still need the finder — install the hook
        _install_worker_hook(vendor_used)
        return True

    # runtime importable but the gencode's version gate rejects it —
    # vendored 6.32 vs gencode 6.33, or a real-but-stale wheel (round-7
    # code review): relax here AND ship the hook so every fresh worker
    # interpreter relaxes too before pyspark.worker's imports
    try:
        common.relax_validator()
    except Exception:
        return False
    if not _gencode_imports():
        return False
    _install_worker_hook(vendor_used)
    return True
