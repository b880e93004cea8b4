"""Derive an sf1 stress dataset from the driver's sf0.1 parquet (r4 VERDICT
#3: sf0.1 cannot expose shuffle spill, AQE skew splits, or broadcast flips).

No external data and no RNG: each FACT table is the sf0.1 table replicated
``FACTOR`` times with the primary key offset by ``copy * KEY_STRIDE`` (so
keys stay unique and modulo-derived fixture semantics keep their
distributions); dimension tables (region/nation/customer/supplier/part) are
copied as-is. Replicated documents keep their text — a 10x exact-duplication
rate is the adversarial case the dedup operators exist for.

Usage: python tools/gen_sf1.py [outdir=/tmp/sf1] [factor=10]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
KEY_STRIDE = 100_000_000  # far above any sf0.1 key

DIMS = ("region", "nation", "customer", "supplier", "part")
#: fact table -> columns offset per copy (keys that must stay unique;
#: foreign keys into dims are left alone so joins keep their fan-out)
FACT_KEYS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],  # stays consistent with orders' offset
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet'"
        )
        print(t, "copied")
    for t, keys in FACT_KEYS.items():
        cols = [
            c[0]
            for c in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + i * {KEY_STRIDE} AS {c}" if c in keys else c for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', range({factor}) r(i)) "
            f"TO '{out}/{t}.parquet'"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
