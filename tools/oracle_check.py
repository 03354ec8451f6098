#!/usr/bin/env python3
"""Dev-only mimic of the driver's DuckDB correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Loads every parquet result written by `graft.Verify`, runs the paired
oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, sorts
columns by name + rows by value, and diffs. Exit 0 iff all match.
"""
import json, sys, glob, os
import duckdb, pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: everything to string via repr-stable rounding
    for c in df.columns:
        if df[c].dtype.kind == 'f':
            df[c] = df[c].round(9)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, '*.parquet')):
        name = os.path.basename(p)[:-len('.parquet')]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    failures = []
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            failures.append((name, 'missing spark result'))
            continue
        try:
            got = canon(pd.read_parquet(res_dir))
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            failures.append((name, f'error: {e}'))
            continue
        if list(got.columns) != list(exp.columns):
            failures.append((name, f'columns {list(got.columns)} vs {list(exp.columns)}'))
        elif len(got) != len(exp):
            failures.append((name, f'rows {len(got)} vs {len(exp)}'))
        else:
            # compare as strings to sidestep dtype differences
            g = got.astype(str); e = exp.astype(str)
            neq = (g != e).any(axis=1)
            if neq.any():
                i = neq.idxmax()
                failures.append((name, f'value mismatch at row {i}:\n  spark={g.loc[i].to_dict()}\n  duck ={e.loc[i].to_dict()}'))
        status = 'FAIL' if failures and failures[-1][0] == name else 'ok'
        print(f'{name}: {status} ({len(got) if "got" in dir() else "?"} rows)' if status=='ok' else f'{name}: FAIL')
    for name, why in failures:
        print(f'--- {name}: {why}')
    sys.exit(1 if failures else 0)

if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
