#!/usr/bin/env python
"""Build the 5x key-shifted scale-probe dataset at /tmp/sf0.5.

Each FACT table is unioned with 4 copies whose integer keys shift by
k * 10^8 (FKs shifted consistently, so join structure stays valid:
lineitem.l_partkey copies reference the part copies that exist, etc).
region/nation stay as-is — shifting nationkey would tile the 25 rect
fixtures onto identical coordinates (10^8 % 5 == 0) and turn every
PIP match into a 5-way multi-match, an artifact rather than scale.

Timing-only data: never run against a DuckDB oracle (the derived
modular tag distributions differ from a true sf0.5).
"""
from __future__ import annotations

import os
import shutil

import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf0.5"
SHIFT = 100_000_000

KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "part": ["p_partkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)
    con = duckdb.connect()
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, ks in KEYS.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for k in range(5):
            proj = ", ".join(
                (f"{c} + {k * SHIFT} AS {c}" if c in ks else c) for c in cols
            )
            selects.append(f"SELECT {proj} FROM '{SRC}/{t}.parquet'")
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
