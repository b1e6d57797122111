#!/usr/bin/env python3
"""Driver-hash canonicalization pre-check — the gap check_oracle.py is blind to.

check_oracle.py reads BOTH sides through DuckDB, so an output column whose
TYPE canonicalizes differently between the two engines' pandas paths passes
there yet hash-fails the driver (r14/r15: the only DATE column in the suite
str()'d as "2024-01-06" from Spark parquet but "2024-01-01 00:00:00" from
DuckDB; r16: DuckDB sum(BIGINT)->HUGEINT str()'d as "212984.0" vs Spark's
"212984"). This tool models the driver's actual asymmetry:

  spark side : pandas.read_parquet (pyarrow)  — what the driver hashes
  oracle side: duckdb .df()                    — what the driver hashes

then compares str()-canonicalized sorted rows (the hash's view) plus pandas
dtypes. A FAIL here with a check_oracle PASS means a type-canonicalization
bug, not a wrong answer — fix the output/oracle types, never the values.

Usage: python3 tools/check_driver_hash.py <sfDir> <verifyOutDir> [name ...]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_rows(df):
    df = df[sorted(df.columns)]
    return sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception:
            n_skip += 1  # not in this (possibly filtered) dump
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: columns differ: oracle={sorted(exp.columns)} "
                  f"spark={sorted(got.columns)}")
            n_fail += 1
            continue
        s, o = canon_rows(got), canon_rows(exp)
        if s != o:
            bad = next((i for i, (a, b) in enumerate(zip(s, o)) if a != b),
                       min(len(s), len(o)))
            sa = s[bad] if bad < len(s) else "<eof>"
            ob = o[bad] if bad < len(o) else "<eof>"
            print(f"FAIL {name}: canonical rows differ at {bad}:")
            print(f"  spark : {sa}")
            print(f"  oracle: {ob}")
            n_fail += 1
            continue
        dts, dto = (dict(got.dtypes.astype(str)),
                    dict(exp.dtypes.astype(str)))
        dt_diff = {c: (dts[c], dto[c]) for c in dts if dts[c] != dto[c]}
        if dt_diff:
            # values str()-match but dtypes differ — flag loudly: a future
            # value (NaN, overflow, sub-second ts) could split the hash
            print(f"WARN {name}: dtype drift (values match): {dt_diff}")
        print(f"PASS {name} ({len(s)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} not in dump")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
