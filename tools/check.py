#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify first
(writes <out>/<query>.parquet + oracle_sql.json), then this script runs
each oracle SQL in DuckDB over the same testdata parquet and compares.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical cell repr: lists/arrays -> tuples for sorting & equality
    def cell(v):
        if isinstance(v, (list, tuple)):
            return tuple(cell(x) for x in v)
        try:
            import numpy as np
            if isinstance(v, np.ndarray):
                return tuple(cell(x) for x in v)
            if isinstance(v, np.generic):
                return v.item()
        except ImportError:
            pass
        return v
    out = df.apply(lambda s: s.map(cell))
    out = out.sort_values(by=list(out.columns), key=lambda s: s.map(repr)).reset_index(drop=True)
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    names = sorted(set(list(oracle.keys()) +
        [os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)]))
    for name in names:
        if only and name not in only:
            continue
        pq = f"{out_dir}/{name}"
        if not os.path.isdir(pq):
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        got = pd.read_parquet(pq)
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(got)})" + ("_EMPTY!" if len(got) == 0 else "")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(g)} duck={len(e)}"
            continue
        gr, er = g.map(repr), e.map(repr)
        if gr.equals(er):
            results[name] = "OK"
        else:
            diff_mask = (gr != er)
            ncell = int(diff_mask.sum().sum())
            rows = diff_mask.any(axis=1)
            idx = list(rows[rows].index[:3])
            detail = []
            for i in idx:
                cols = [c for c in g.columns if gr.at[i, c] != er.at[i, c]]
                detail.append(f"row{i} " + "; ".join(
                    f"{c}: spark={g.at[i, c]!r} duck={e.at[i, c]!r}" for c in cols[:3]))
            results[name] = f"VALUE_MISMATCH {ncell} cells | " + " || ".join(detail)
    ok = sum(1 for v in results.values() if v == "OK" or v.startswith("ROWS_ONLY(") and "EMPTY" not in v)
    for name in sorted(results):
        print(f"{results[name][:400]:<60}  {name}" if len(results[name]) < 60
              else f"{name}\n    {results[name][:800]}")
    print(f"\n{ok}/{len(results)} passing")

if __name__ == "__main__":
    main()
