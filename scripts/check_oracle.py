#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run Verify's parquet
dumps against the oracle SQL in DuckDB and compare hash-exactly.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            failed.append(name)
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        g, x = canon(got), canon(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} duck={list(x.columns)}")
            failed.append(name)
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows spark={len(g)} duck={len(x)}")
            failed.append(name)
            continue
        mismatch = None
        for c in g.columns:
            a, b = g[c], x[c]
            # A dtype-kind split (int64 vs float64/object) means DuckDB
            # returned a type pandas had to coerce (e.g. HUGEINT). The
            # driver's hash compare does NOT coerce, so treat it as a
            # failure here too instead of papering over it with astype.
            if a.dtype.kind in "iu" and b.dtype.kind not in "iu":
                mismatch = (c, -1, f"dtype {a.dtype}", f"dtype {b.dtype}", len(a))
                break
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                eq = (a.astype("float64").values == b.astype("float64").values) | (
                    a.isna().values & b.isna().values)
            else:
                try:
                    eq = (a.values == b.values) | (a.isna().values & b.isna().values)
                except Exception:
                    eq = a.astype(str).values == b.astype(str).values
            if not eq.all():
                i = int((~eq).argmax())
                mismatch = (c, i, a.iloc[i], b.iloc[i], int((~eq).sum()))
                break
        if mismatch:
            c, i, av, bv, n = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={av!r} duck={bv!r} ({n} rows differ)")
            failed.append(name)
        else:
            print(f"OK   {name}: {len(g)} rows")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} oracle-checked queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
