"""Worker-side protobuf shim hook (see ../pbshim.py for the full story).

This directory is prepended to PYTHONPATH by
r_e_hive__spark.streaming.pbshim.enable_protobuf_shim() ONLY when the
container lacks a protobuf wheel but an OS-vendored pure-Python runtime
exists; Python imports ``sitecustomize`` at interpreter startup, which is
the only moment early enough to patch before ``pyspark.worker``'s
module-level ``pyspark.sql.streaming.proto`` import.  Everything below is
defensive: any failure leaves the interpreter exactly as it was.

The runtime probe imports ``google.protobuf.descriptor`` (an actual
module), NOT ``google.protobuf``: Spark workers carry spark-core's jar on
sys.path and its bundled ``google/protobuf/*.proto`` resources satisfy
the bare package import as an EMPTY namespace package (PEP 420), which
then breaks the generated code with "cannot import name 'descriptor'
(unknown location)".  After appending the vendor path, the phantom
namespace modules must be purged from sys.modules so the re-import finds
the vendor's regular packages.
"""

try:  # real runtime installed → nothing to do
    import google.protobuf.descriptor  # noqa: F401
except Exception:
    try:
        import os
        import sys

        _vend = os.environ.get(
            "REHIVE_PB_VENDOR",
            "/usr/lib/google-cloud-sdk/platform/google_appengine",
        )
        if os.path.isdir(os.path.join(_vend, "google", "protobuf")):
            if _vend not in sys.path:
                sys.path.append(_vend)  # END: never shadow real packages
            for _n in [
                n
                for n in sys.modules
                if n == "google" or n.startswith("google.")
            ]:
                if getattr(sys.modules[_n], "__file__", None) is None:
                    del sys.modules[_n]
            from google.protobuf import runtime_version as _rv

            _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    except Exception:
        pass
