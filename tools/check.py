#!/usr/bin/env python3
"""Local pre-check of SparkEntry.queries vs DuckDB oracle (emulates the
driver's t2 compare: column-name-sorted, row-sorted, value compare with
float tolerance). Usage: check.py <verify_out_dir> <sf_dir> [jobs]

Each query's compare is independent, so they run across a process pool
(default: min(8, cpus); override with the optional [jobs] argv or
CHECK_JOBS env). The heavy tail — the recursive-CTE oracles (video frame
walk, connected-components keep replays) — no longer serializes the whole
gate behind one DuckDB process; output is buffered per query and printed
in sorted order, so the report is byte-compatible with the sequential
form."""
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

_CON = None
_OUT_DIR = None


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


def _init_worker(sf_dir: str, out_dir: str):
    global _CON, _OUT_DIR
    _CON = duckdb.connect()
    _OUT_DIR = out_dir
    for t in TABLES:
        _CON.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")


def check_one(item):
    """One query's compare: returns (name, passed, lines-to-print)."""
    name, sql = item
    try:
        got = pd.read_parquet(f"{_OUT_DIR}/{name}")
    except Exception as ex:
        return name, False, [f"FAIL {name}: no spark output ({ex})"]
    try:
        exp = _CON.sql(sql).df()
    except Exception as ex:
        return name, False, [f"FAIL {name}: oracle SQL error: {ex}"]
    errs = compare(name, got, exp)
    hard = [e for e in errs if not e.startswith("NOTE")]
    if hard:
        return name, False, [f"FAIL {name} ({len(got)} rows)"] + \
            [f"   {e}" for e in errs[:6]]
    notes = "; ".join(e for e in errs if e.startswith("NOTE"))
    return name, True, [f"PASS {name} ({len(got)} rows)" + (f"  [{notes}]" if notes else "")]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    jobs = int(sys.argv[3]) if len(sys.argv) > 3 else \
        int(os.environ.get("CHECK_JOBS", min(8, os.cpu_count() or 1)))
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    items = sorted(oracle.items())
    if jobs <= 1:
        _init_worker(sf_dir, out_dir)
        results = [check_one(it) for it in items]
    else:
        from concurrent.futures import ProcessPoolExecutor
        with ProcessPoolExecutor(max_workers=jobs, initializer=_init_worker,
                                 initargs=(sf_dir, out_dir)) as pool:
            results = list(pool.map(check_one, items))
    n_pass = n_fail = 0
    for _, passed, lines in sorted(results, key=lambda r: r[0]):
        for ln in lines:
            print(ln)
        if passed:
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
