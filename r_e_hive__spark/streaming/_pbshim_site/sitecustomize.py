"""Worker-side protobuf shim hook (full story: ../pbshim.py and
_pbshim_common.py in this directory).

This directory is prepended to PYTHONPATH by
r_e_hive__spark.streaming.pbshim.enable_protobuf_shim() ONLY when the
driver established that this environment needs the shim — either no
protobuf wheel exists (the OS-vendored runtime is served via a meta-path
finder) or the installed wheel is older than PySpark's gencode (only the
version gate needs relaxing).  Python imports ``sitecustomize`` at
interpreter startup, the one moment early enough to patch before
``pyspark.worker``'s module-level ``pyspark.sql.streaming.proto``
import.  Everything is defensive: any failure leaves the interpreter
exactly as it was.
"""

try:
    import _pbshim_common

    _pbshim_common.ensure_protobuf(relax=True)
except Exception:
    pass
