#!/usr/bin/env python3
"""One-off probe: which compare pipeline reproduces CORRECTNESS_r01 exactly?

Hypothesis H: driver reads the Spark result parquet via pyarrow/pandas
(decimals -> decimal.Decimal objects), the oracle via duckdb .df()
(DECIMAL/HUGEINT -> float64), canonicalizes cells with str(), sorts
columns by name and rows, and hashes. Prediction: mismatch iff a decimal
cell's exact string differs from the float64 repr of the same value.

Usage: driverprobe.py <sfDir> <verifyOutDir> <correctness.json>
"""
import json, sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    cols = sorted(df.columns)
    rows = []
    for _, r in df[cols].iterrows():
        rows.append(tuple("NULL" if pd.isna(v) else str(v) for v in r))
    return sorted(rows)


def main(sf_dir, out_dir, corr_path):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    corr = json.loads(Path(corr_path).read_text())
    agree = disagree = 0
    for name, sql in sorted(oracles.items()):
        expected = corr.get(name, {}).get("hash_match")
        if expected is None:
            continue
        spark_df = pd.read_parquet(Path(out_dir, name))     # pyarrow: Decimal objects
        oracle_df = con.execute(sql).df()                    # duckdb: DECIMAL->float64
        predicted = canon(spark_df) == canon(oracle_df)
        mark = "OK " if predicted == expected else "XXX"
        if predicted == expected:
            agree += 1
        else:
            disagree += 1
        print(f"{mark} {name}: predicted={'pass' if predicted else 'FAIL'} driver={'pass' if expected else 'FAIL'}")
    print(f"== hypothesis agrees on {agree}, disagrees on {disagree} ==")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
