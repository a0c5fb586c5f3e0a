#!/usr/bin/env python3
"""Dev-loop correctness checker mirroring the driver's DuckDB oracle
compare: for each SparkEntry query, read the Verify parquet dump and the
oracle SQL, run the oracle in DuckDB over the same sf dir, sort columns
by name, and compare values.

Usage: python3 tools/check.py <sfdir> <verify_outdir> [key ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for key in sorted(oracle):
        if only and key not in only:
            continue
        sql = oracle[key]
        pdir = os.path.join(outdir, key)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            print(f"FAIL {key}: no spark output");  n_fail += 1; continue
        try:
            got = con.execute(f"SELECT * FROM '{pdir}/*.parquet'").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {key}: {e}"); n_fail += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {key}: cols {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {key}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        # compare column-wise with dtype awareness
        bad = None
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    eq = (a.isna() & b.isna()) | (a == b)
                else:
                    eq = (a.isna() & b.isna()) | (a.astype(object) == b.astype(object))
            except Exception as e:
                bad = (c, f"compare error {e}"); break
            if not eq.all():
                i = int(np.argmin(eq.values))
                bad = (c, f"row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r} "
                          f"(dtypes {a.dtype}/{b.dtype})")
                break
        if bad:
            print(f"FAIL {key}: col {bad[0]} {bad[1]}"); n_fail += 1
        else:
            # also flag dtype mismatches as warnings (schema-hash risk)
            dt = [(c, str(got[c].dtype), str(want[c].dtype))
                  for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
            note = f"  [dtype warn: {dt}]" if dt else ""
            print(f"PASS {key} ({len(got)} rows){note}"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
