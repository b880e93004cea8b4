"""Local replica of the driver's correctness gate: run every queries() entry
via Spark and its oracle_sql() via DuckDB at sf0.01 and compare row count,
column names, and order-insensitive values (floats rounded to 9 sig digits).

Usage: python tools/check_entry.py [--json OUT.json] [sf_dir] [query ...]

``--json`` writes a machine-readable per-query result map (same shape as
the driver's CORRECTNESS_r{N}.json rows) — committed each round as
CORRECTNESS_LOCAL_r{N}.json so every registered query has a green
machine-readable row even when the driver's own window trails the registry
(r3 VERDICT #2).
"""

from __future__ import annotations

import json
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from etherscan_contract_crawler_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_val(r[i]) for i in idx) for r in rows)


def main():
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark(app_name="check_entry", cpus=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    n_pass = n_fail = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec = results[name] = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
            "wall_s": None,
        }
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
        except Exception as e:
            rec["err"] = f"spark error: {str(e).splitlines()[0][:160]}"
            rec["wall_s"] = round(time.time() - t0, 1)
            print(f"FAIL {name}: {rec['err']}")
            n_fail += 1
            continue
        if name not in os_:
            rec["err"] = "rows-only (no SQL oracle by design)"
            rec["rows_match"] = rec["spark_rows"] >= 0
            rec["wall_s"] = round(time.time() - t0, 1)
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {rec['wall_s']}s)")
            continue
        try:
            res = con.execute(os_[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            rec["oracle_rows"] = len(drows)
        except Exception as e:
            rec["err"] = f"duckdb error: {str(e).splitlines()[0][:160]}"
            rec["wall_s"] = round(time.time() - t0, 1)
            print(f"FAIL {name}: {rec['err']}")
            n_fail += 1
            continue
        rec["schema_match"] = sorted(scols) == sorted(dcols)
        rec["rows_match"] = len(srows) == len(drows)
        problems = []
        if not rec["schema_match"]:
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if not rec["rows_match"]:
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            a = norm_rows(scols, srows)
            b = norm_rows(dcols, drows)
            rec["hash_match"] = a == b
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diff}")
        else:
            rec["hash_match"] = False
        rec["wall_s"] = round(time.time() - t0, 1)
        if problems:
            rec["err"] = "; ".join(problems)[:400]
            print(f"FAIL {name}: {rec['err']}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {rec['wall_s']}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {json_out} ({len(results)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
