#!/usr/bin/env python3
"""Local pre-check of SparkEntry.queries vs DuckDB oracle (emulates the
driver's t2 compare: column-name-sorted, row-sorted, value compare with
float tolerance). Usage: check.py <verify_out_dir> <sf_dir>"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp-ish columns to ns datetimes, naive
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, kind="mergesort", na_position="last").reset_index(drop=True)
    return df


def compare(name, got: pd.DataFrame, exp: pd.DataFrame) -> list:
    errs = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"columns differ: got {sorted(got.columns)} exp {sorted(exp.columns)}"]
    if len(got) != len(exp):
        return [f"row count differ: got {len(got)} exp {len(exp)}"]
    got, exp = canon(got), canon(exp)
    for c in got.columns:
        g, e = got[c], exp[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(e.dtype, np.floating):
            g = g.astype(float).to_numpy()
            e = e.astype(float).to_numpy()
            both_nan = np.isnan(g) & np.isnan(e)
            close = np.isclose(g, e, rtol=1e-9, atol=1e-9) | both_nan
            if not close.all():
                i = int(np.argmin(close))
                errs.append(f"col {c}: {int((~close).sum())} mismatches, e.g. row {i}: got {g[i]} exp {e[i]}")
        else:
            eq = (g == e) | (g.isna() & e.isna())
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                errs.append(f"col {c} ({g.dtype}/{e.dtype}): {int((~eq).sum())} mismatches, e.g. row {i}: got {g.iloc[i]!r} exp {e.iloc[i]!r}")
    # dtype report (informational)
    for c in got.columns:
        if str(got[c].dtype) != str(exp[c].dtype):
            errs.append(f"NOTE dtype {c}: got {got[c].dtype} exp {exp[c].dtype}")
    return errs


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as ex:
            print(f"FAIL {name}: no spark output ({ex})")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL error: {ex}")
            n_fail += 1
            continue
        errs = compare(name, got, exp)
        hard = [e for e in errs if not e.startswith("NOTE")]
        if hard:
            n_fail += 1
            print(f"FAIL {name} ({len(got)} rows)")
            for e in errs[:6]:
                print(f"   {e}")
        else:
            n_pass += 1
            notes = "; ".join(e for e in errs if e.startswith("NOTE"))
            print(f"PASS {name} ({len(got)} rows)" + (f"  [{notes}]" if notes else ""))
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
