#!/usr/bin/env python3
"""Local parity harness: mimics the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir]
Reads <out>/oracle_sql.json, runs each SQL in DuckDB over the sf_dir parquet
tables, loads the Spark-written parquet from <out>/<name>/, and diffs
(columns sorted by name, rows sorted, exact value compare).
"""
import sys, json, glob, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if np.issubdtype(s.dtype, np.floating):
            out[c] = s.astype('float64')
        elif np.issubdtype(s.dtype, np.datetime64):
            out[c] = s.astype('datetime64[us]').astype(str)
        else:
            out[c] = s.astype(str)
    r = pd.DataFrame(out)
    return r.sort_values(by=list(r.columns), kind='mergesort').reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    out_dir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
    only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None
    oracle = json.load(open(f'{out_dir}/oracle_sql.json'))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            files = glob.glob(f'{out_dir}/{name}/*.parquet')
            if not files:
                print(f'FAIL {name}: no spark output'); n_fail += 1; continue
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            exp = con.execute(sql).df()
        except Exception as e:
            print(f'FAIL {name}: {type(e).__name__}: {e}'); n_fail += 1; continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f'FAIL {name}: cols spark={sorted(got.columns)} oracle={sorted(exp.columns)}')
            n_fail += 1; continue
        dt = [f'{c}: {got[c].dtype} vs {exp[c].dtype}' for c in got.columns
              if str(got[c].dtype) != str(exp[c].dtype)]
        if dt:
            print(f'FAIL {name}: dtype mismatch {"; ".join(dt)}'); n_fail += 1; continue
        if len(got) != len(exp):
            print(f'FAIL {name}: rows spark={len(got)} oracle={len(exp)}'); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        bad = []
        for c in g.columns:
            if np.issubdtype(g[c].dtype, np.floating):
                a, b = g[c].values, e[c].values
                eq = (a == b) | (np.isnan(a) & np.isnan(b))
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad.append(f'{c}: {int((~eq).sum())} diffs, e.g. row {i}: {a[i]!r} vs {b[i]!r} (maxabs={np.nanmax(np.abs(a-b)):.3e})')
            else:
                eq = (g[c].values == e[c].values)
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad.append(f'{c}: {int((~eq).sum())} diffs, e.g. row {i}: {g[c].values[i]!r} vs {e[c].values[i]!r}')
        if bad:
            print(f'FAIL {name}: ' + ' | '.join(bad)); n_fail += 1
        else:
            print(f'PASS {name} ({len(got)} rows)'); n_pass += 1
    print(f'== {n_pass} pass, {n_fail} fail ==')
    sys.exit(1 if n_fail else 0)


if __name__ == '__main__':
    main()
