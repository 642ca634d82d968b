#!/usr/bin/env python3
"""Dev-only driver simulator: runs graft.Verify's parquet dumps against the
DuckDB oracles in oracle_sql.json and reports per-query match status.
Mirrors the round driver's compare: sort columns by name, sort rows, compare
values. NOT part of the shipped library (the engine itself is pure Scala).

usage: python3 tools/check_oracle.py <sfdir> <outdir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

with open(os.path.join(outdir, "oracle_sql.json")) as f:
    oracles = json.load(f)

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fail = 0
for name in sorted(oracles):
    qdir = os.path.join(outdir, name)
    if not os.path.isdir(qdir):
        print(f"{name}: MISSING spark output"); fail += 1; continue
    got = canon(pd.read_parquet(qdir))
    want = canon(con.execute(oracles[name]).df())
    if list(got.columns) != list(want.columns):
        print(f"{name}: SCHEMA mismatch spark={list(got.columns)} duck={list(want.columns)}")
        fail += 1; continue
    if len(got) != len(want):
        print(f"{name}: ROWS mismatch spark={len(got)} duck={len(want)}"); fail += 1; continue
    ok = True
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            # DRIVER-STRICT float compare (round-6 verdict #2): the driver
            # hashes serialized values, so -0.0 vs 0.0 (and any other
            # bit-level divergence) is a mismatch even though numpy's
            # array_equal treats them as equal. Compare the int64 bit
            # patterns, with NaNs canonicalized to one quiet-NaN pattern.
            af = a.astype(np.float64).copy()
            bf = b.astype(np.float64).copy()
            af[np.isnan(af)] = np.float64('nan')
            bf[np.isnan(bf)] = np.float64('nan')
            ab, bb = af.view(np.int64), bf.view(np.int64)
            eq = np.array_equal(ab, bb)
            if not eq:
                m = ab != bb
                idx = int(np.argmax(m))
                print(f"{name}: VALUE mismatch col={c} first_bad="
                      f"({idx}, {af[idx]!r}, {bf[idx]!r}) [bit-strict]")
                ok = False; fail += 1
                break
        else:
            eq = (pd.Series(a).astype(object) == pd.Series(b).astype(object)).all()
            if not eq:
                bad = None
                try:
                    m = a != b
                    idx = int(np.argmax(m))
                    bad = (idx, a[idx], b[idx])
                except Exception:
                    pass
                print(f"{name}: VALUE mismatch col={c} first_bad={bad}")
                ok = False; fail += 1
                break
    if ok:
        print(f"{name}: OK rows={len(got)}")

sys.exit(1 if fail else 0)
