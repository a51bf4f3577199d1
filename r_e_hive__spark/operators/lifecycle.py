"""Table-lifecycle operators: targeted copy-on-write delete + compaction.

Two maintenance jobs every long-lived 100 TB corpus needs and plain
parquet directories don't give you:

- ``delete_where`` — GDPR/takedown-shaped row deletion.  Rewriting the
  whole table to drop one user's documents is a non-starter at scale;
  this is the lakehouse copy-on-write MERGE/DELETE pattern on bare
  parquet: read each file's FOOTER min/max for the predicate column
  (no data scan), rewrite ONLY the files whose range can contain
  matching rows, leave every other file byte-identical.  A z-ordered /
  range-clustered layout (operators/layout.py) makes the touched-file
  set small — clustering and targeted deletes compose.
- ``compact_files`` — small-file compaction.  Streaming sinks and
  per-request appends (io.append_facts) accumulate many small files;
  readers pay per-file open/footer costs and lose vectorized-scan
  efficiency.  Bin-packs the directory into ~``target_bytes`` outputs
  with one column-preserving rewrite.

Both are REPLACE-directory-contents jobs with the same atomicity
contract as the rest of io.py (SURVEY.md §2.1 S5): the rewrite lands in
a sibling temp dir first, then files swap in one pass — a crash leaves
either the old file or the new file per path, never a half-written
parquet (writes go to temp + rename).  A real deployment would wrap the
swap in a manifest/lakehouse commit; the job structure (footer-pruned
touch set, temp-dir staging) is the part that carries to 100 TB.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _data_files(path: str) -> list[str]:
    return sorted(
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    )


def _file_touches(f: str, col: str, lo, hi) -> bool:
    """Footer-only check: can this file contain rows with col in
    [lo, hi]?  Stats-less chunks conservatively answer yes."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(f).metadata
    names = {md.schema.column(i).name: i for i in range(len(md.schema))}
    if col not in names:
        return True
    ci = names[col]
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        if st is None or not st.has_min_max:
            return True
        if not (st.max < lo or st.min > hi):
            return True
    return False


def delete_where(
    spark: SparkSession,
    path: str,
    col: str,
    lo,
    hi=None,
    extra_predicate: Column | None = None,
) -> dict:
    """Copy-on-write delete of rows with ``col BETWEEN lo AND hi`` (one
    value when ``hi`` is None) — plus an optional ``extra_predicate``
    conjunct — touching only the files whose footer range intersects.

    Returns {files_total, files_touched, rows_deleted}.  The untouched
    files are never read past their footers, let alone rewritten — on a
    clustered table the touch set is O(matching data), not O(table).
    """
    hi = lo if hi is None else hi
    files = _data_files(path)
    touched = [f for f in files if _file_touches(f, col, lo, hi)]
    if not touched:
        return {"files_total": len(files), "files_touched": 0, "rows_deleted": 0}

    hit = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    if extra_predicate is not None:
        hit = hit & extra_predicate
    # SQL DELETE semantics: a NULL predicate means "not deleted".  The
    # keep-side filter must therefore be NOT coalesce(hit, false) — a bare
    # ~hit is NULL for NULL-predicate rows and where() drops them from the
    # rewrite, silently losing data beyond the requested delete (round-5
    # ADVICE, high).  The deleted count likewise counts only hit IS TRUE.
    hit = F.coalesce(hit, F.lit(False))
    src = spark.read.parquet(*touched)
    n_del = src.where(hit).count()
    if n_del == 0:
        return {"files_total": len(files), "files_touched": 0, "rows_deleted": 0}

    staging = tempfile.mkdtemp(
        prefix="_cow_delete_", dir=os.path.dirname(os.path.abspath(path))
    )
    try:
        # one file per touched input keeps the layout's clustering intact
        src.where(~hit).coalesce(max(1, len(touched))).write.mode(
            "overwrite"
        ).parquet(staging)
        new_files = _data_files(staging)
        # swap: drop the touched originals, move rewrites in under fresh
        # names (no reader ever sees a half-written parquet: writes above
        # went to the staging dir, moves are renames within one fs)
        for f in touched:
            os.remove(f)
        for nf in new_files:
            os.replace(
                nf, os.path.join(path, f"part-cow-{uuid.uuid4().hex}.parquet")
            )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return {
        "files_total": len(files),
        "files_touched": len(touched),
        "rows_deleted": n_del,
    }


def compact_files(
    spark: SparkSession, path: str, target_bytes: int = 128 << 20
) -> dict:
    """Bin-pack a parquet directory's small files into ~``target_bytes``
    outputs (the OPTIMIZE/compaction maintenance job).

    Only files below ``target_bytes`` participate; already-right-sized
    files stay byte-identical, so repeated compaction is idempotent and
    the job cost is O(small files), not O(table).  Returns
    {files_before, files_compacted, files_after_compaction}.
    """
    files = _data_files(path)
    small = [f for f in files if os.path.getsize(f) < target_bytes]
    if len(small) <= 1:
        return {
            "files_before": len(files),
            "files_compacted": 0,
            "files_after_compaction": 0,
        }
    total = sum(os.path.getsize(f) for f in small)
    n_out = max(1, (total + target_bytes - 1) // target_bytes)
    staging = tempfile.mkdtemp(
        prefix="_compact_", dir=os.path.dirname(os.path.abspath(path))
    )
    try:
        spark.read.parquet(*small).coalesce(int(n_out)).write.mode(
            "overwrite"
        ).parquet(staging)
        new_files = _data_files(staging)
        for f in small:
            os.remove(f)
        for nf in new_files:
            os.replace(
                nf, os.path.join(path, f"part-compact-{uuid.uuid4().hex}.parquet")
            )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return {
        "files_before": len(files),
        "files_compacted": len(small),
        "files_after_compaction": len(new_files),
    }
