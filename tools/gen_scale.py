#!/usr/bin/env python
"""Generate larger scale factors from the driver's frozen sf0.1 testdata.

The container has no network (DuckDB's tpch extension cannot download), so
bigger scales are built by **disjoint-universe replication**: FACTOR copies
of sf0.1 with every key column shifted by copy_index * stride (stride =
max(key)+1), which preserves join fan-outs, group cardinalities per key,
and value distributions exactly — each copy is a parallel universe of the
original.  Deterministic (no randomness at all), written with DuckDB.

Per-table key shifts:
  customer.c_custkey | orders.o_orderkey/o_custkey |
  lineitem.l_orderkey/l_partkey/l_suppkey | part.p_partkey |
  supplier.s_suppkey | events.event_id/user_id | documents.doc_id |
  embeddings.vec_id.  region/nation are fixed dimensions (copied once).

documents.text additionally gets every token suffixed with the copy index
(copy 0 keeps the original), so near-duplicate structure is preserved
WITHIN each copy but no cross-copy false near-dups appear — pair-expansion
work in the dedup benches scales linearly with the factor, like a real
corpus, instead of quadratically via artifacts.  n_chars is recomputed.

Usage:  python tools/gen_scale.py /tmp/testdata/sf1 10
        python tools/gen_scale.py /tmp/testdata/sf5 50
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SRC_SF_DIR", "/root/testdata/sf0.1")

# table -> list of key columns to shift (stride = max over SOURCE table that
# OWNS the key, so FKs stay aligned with their parents across copies)
KEY_OWNERS = {
    "c": ("customer", "c_custkey"),
    "o": ("orders", "o_orderkey"),
    "p": ("part", "p_partkey"),
    "s": ("supplier", "s_suppkey"),
    "e": ("events", "event_id"),
    "u": ("events", "user_id"),
    "d": ("documents", "doc_id"),
    "v": ("embeddings", "vec_id"),
}

SHIFTS = {
    "customer": {"c_custkey": "c"},
    "orders": {"o_orderkey": "o", "o_custkey": "c"},
    "lineitem": {"l_orderkey": "o", "l_partkey": "p", "l_suppkey": "s"},
    "part": {"p_partkey": "p"},
    "supplier": {"s_suppkey": "s"},
    "events": {"event_id": "e", "user_id": "u"},
    "documents": {"doc_id": "d"},
    "embeddings": {"vec_id": "v"},
}

FIXED = ("region", "nation")


def main() -> None:
    dst, factor = sys.argv[1], int(sys.argv[2])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    strides = {
        k: con.execute(
            f"SELECT MAX({col}) + 1 FROM '{SRC}/{t}.parquet'"
        ).fetchone()[0]
        for k, (t, col) in KEY_OWNERS.items()
    }

    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )

    for t, shifts in SHIFTS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        parts = []
        for i in range(factor):
            sel = []
            for c in cols:
                if c in shifts:
                    sel.append(f"{c} + {i * strides[shifts[c]]} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    # suffix every token with the copy index: preserves
                    # within-copy shingle structure, kills cross-copy dups
                    sel.append(
                        f"regexp_replace(text, '(\\S+)', '\\1{i}', 'g') AS text"
                    )
                elif t == "documents" and c == "n_chars" and i > 0:
                    sel.append(
                        f"LENGTH(regexp_replace(text, '(\\S+)', '\\1{i}', 'g')) AS n_chars"
                    )
                elif t == "part" and c == "p_name" and i > 0:
                    # doubled copy-marker suffix: any two distinct copies
                    # differ in >=2 suffix chars, so cross-copy Levenshtein
                    # distance is >=2 and the x32 fuzzy join's TRUE pair
                    # count grows ~linearly with factor (copy 0 keeps the
                    # original names; within-copy pair structure preserved)
                    # -- VERDICT r8 item 6: without this, verbatim name
                    # replication made true pairs grow ~quadratically.
                    sel.append(f"p_name || ' z{i}z{i}' AS p_name")
                else:
                    sel.append(c)
            parts.append(
                f"SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet'"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}/{t}.parquet' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 1048576)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
