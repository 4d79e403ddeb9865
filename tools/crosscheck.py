#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: crosscheck.py <sfDir> <verifyOutDir>

Loads each <outDir>/<query> parquet (Spark result), runs the matching
oracle_sql.json entry in DuckDB over the sfDir parquet tables, then
compares: column names (sorted), row count, and values (rows sorted by all
columns, numerics canonicalized). Prints PASS/FAIL per query.

Dev tool only — runs on the driver-side python stack (duckdb/pyarrow),
never shipped in the Scala library.
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return f"{float(v):.6g}"
    except Exception:
        pass
    import datetime
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = Path(out_dir, name)
        if not spark_dir.exists():
            print(f"MISSING {name}")
            n_fail += 1
            continue
        srel = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        scols, srows = srel.description, srel.fetchall()
        scols = [c[0] for c in scols]
        orel = con.execute(sql)
        ocols, orows = [c[0] for c in orel.description], orel.fetchall()
        sc, sr = canon_rows(scols, srows)
        oc, orr = canon_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} vs {oc}")
            n_fail += 1
        elif len(sr) != len(orr):
            print(f"FAIL {name}: rows {len(sr)} vs {len(orr)}")
            n_fail += 1
        elif sr != orr:
            diffs = [i for i, (a, b) in enumerate(zip(sr, orr)) if a != b][:3]
            print(f"FAIL {name}: values differ, e.g. rows {diffs}:")
            for i in diffs:
                print(f"   spark  {sr[i]}\n   oracle {orr[i]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
