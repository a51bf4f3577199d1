"""Protobuf-shim core shared by the driver (streaming/pbshim.py, which
loads this file by path) and the workers (sitecustomize.py in this
directory, which imports it by name — this dir is the PYTHONPATH hook).

Design (round-7 code review, replacing a sys.path append):

- The vendored runtime is served by a META-PATH finder that answers ONLY
  for ``google.protobuf`` and its submodules (plus a pure-namespace
  ``google`` when nothing else provides one).  Appended at the END of
  ``sys.meta_path``, so every normally-importable module — a real
  protobuf wheel, google-auth/google-cloud namespace siblings — wins
  first; the finder only catches what the default finders failed to
  resolve.  A sys.path append could not make that guarantee: a regular
  ``google`` package on sys.path beats all PEP-420 namespace portions
  regardless of position, breaking ``google.auth`` et al.
- Phantom cache purge: Spark workers carry spark-core's jar on sys.path
  and its bundled ``google/protobuf/*.proto`` resources satisfy the bare
  package imports as EMPTY namespace packages.  Once cached in
  sys.modules they would keep masking the finder, so phantom (no
  ``__file__``) entries in exactly the ``google`` / ``google.protobuf``
  subtree are dropped before retrying.
"""

from __future__ import annotations

import importlib
import importlib.machinery
import importlib.util
import os
import sys

DEFAULT_VENDOR = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def vendor_path() -> str | None:
    """First existing pure-Python protobuf vendor tree; REHIVE_PB_VENDOR
    overrides (and is how the driver pins its choice for the workers)."""
    env = os.environ.get("REHIVE_PB_VENDOR")
    for c in (env, DEFAULT_VENDOR):
        if c and os.path.isdir(os.path.join(c, "google", "protobuf")):
            return c
    return None


class PbVendorFinder:
    """Meta-path finder for ``google.protobuf.*`` out of a vendor tree."""

    def __init__(self, vend: str):
        self.vend = vend

    def find_spec(self, fullname, path=None, target=None):
        if fullname == "google":
            # reached only when no installed package/namespace provides
            # 'google' at all (default finders ran first) — fabricate an
            # empty namespace so 'google.protobuf' can hang off it
            spec = importlib.machinery.ModuleSpec(
                fullname, None, is_package=True
            )
            spec.submodule_search_locations = []
            return spec
        parts = fullname.split(".")
        if parts[:2] != ["google", "protobuf"]:
            return None
        base = os.path.join(self.vend, *parts)
        if os.path.isdir(base):
            init = os.path.join(base, "__init__.py")
            if os.path.isfile(init):
                return importlib.util.spec_from_file_location(
                    fullname, init, submodule_search_locations=[base]
                )
            spec = importlib.machinery.ModuleSpec(
                fullname, None, is_package=True
            )
            spec.submodule_search_locations = [base]
            return spec
        f = base + ".py"
        if os.path.isfile(f):
            return importlib.util.spec_from_file_location(fullname, f)
        return None


def relax_validator() -> None:
    """No-op protobuf's gencode/runtime version gate (the ONLY patch)."""
    rv = importlib.import_module("google.protobuf.runtime_version")
    rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None


def _purge_phantom_google(vendor_trees: tuple[str, ...] = ()) -> None:
    """Evict ``google`` / ``google.protobuf*`` modules that are phantom
    namespaces (no ``__file__`` — the spark-core jar artifact) or were
    loaded from one of ``vendor_trees`` (a vendor being retired: a
    cached parent whose ``__path__`` points into the old tree would keep
    resolving submodules there ahead of any new finder — round-7 second
    review).  Modules from a real wheel (site-packages) are never
    touched."""
    for name in list(sys.modules):
        if name == "google" or name.startswith("google.protobuf"):
            f = getattr(sys.modules[name], "__file__", None)
            if f is None or any(
                f.startswith(v + os.sep) for v in vendor_trees
            ):
                del sys.modules[name]


def runtime_ok() -> bool:
    """True iff an actual protobuf MODULE imports — a bare ``import
    google.protobuf`` is satisfied by the jar's phantom namespace and
    proves nothing."""
    try:
        importlib.import_module("google.protobuf.descriptor")
        return True
    except Exception:
        return False


def ensure_protobuf(relax: bool = False) -> tuple[bool, str | None]:
    """Make a protobuf runtime importable.

    Returns ``(ok, vendor_used)`` — ``vendor_used`` is the vendor tree
    the finder now serves from, or None when a real wheel sufficed.
    ``relax=True`` additionally no-ops the version gate whenever a
    runtime is importable (the worker hook passes True: the hook only
    rides PYTHONPATH when the driver established this environment needs
    the relaxation)."""
    used = None
    ok = runtime_ok()
    if not ok:
        vend = vendor_path()
        if vend is not None:
            # retire finders serving a DIFFERENT tree (a corrected
            # REHIVE_PB_VENDOR must take effect on retry), evict any
            # modules cached from retired trees (a cached parent's
            # __path__ would keep resolving submodules from the old tree
            # ahead of the new finder), and never leave ANY finder
            # behind for a tree that failed to import — a stale finder
            # would keep serving the broken tree while `used` reports
            # the new path (round-7 reviews, both passes)
            retired = tuple(
                f.vend
                for f in sys.meta_path
                if isinstance(f, PbVendorFinder) and f.vend != vend
            )
            sys.meta_path = [
                f
                for f in sys.meta_path
                if not (isinstance(f, PbVendorFinder) and f.vend != vend)
            ]
            if not any(
                isinstance(f, PbVendorFinder) for f in sys.meta_path
            ):
                sys.meta_path.append(PbVendorFinder(vend))
            _purge_phantom_google(retired)
            ok = runtime_ok()
            if ok:
                used = vend
            else:
                # strip every finder for vend — pre-existing ones too:
                # the tree just failed to import
                sys.meta_path = [
                    f
                    for f in sys.meta_path
                    if not isinstance(f, PbVendorFinder)
                ]
                _purge_phantom_google((vend,))
    if ok and relax:
        try:
            relax_validator()
        except Exception:
            pass
    return ok, used
