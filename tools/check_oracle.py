#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify's output
against DuckDB oracles and compare values exactly.

Usage: python3 tools/check_oracle.py <verifyOutDir> <sfDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="first").reset_index(drop=True)
    return df

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    rows_only = []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = sorted(glob.glob(f"{d}/*.parquet"))
        got = pq.read_table(files).to_pandas() if files else pd.DataFrame()
        if name not in oracle:
            rows_only.append((name, len(got)))
            continue
        try:
            exp = con.execute(oracle[name]).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            fail += 1
            continue
        bad = []
        for c in g.columns:
            a, b = g[c], e[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    same = ((a.isna() & b.isna()) | (a == b)).all()
                    exact = same
                    close = ((a.isna() & b.isna()) | (np.isclose(a.astype(float), b.astype(float), rtol=1e-12, equal_nan=True))).all()
                else:
                    a2 = a.astype(str); b2 = b.astype(str)
                    exact = (a2 == b2).all()
                    close = exact
            except Exception as ex:
                exact = close = False
            if not exact:
                bad.append((c, "close" if close else "DIFF",
                            str(a.dtype), str(b.dtype)))
        if bad:
            print(f"FAIL {name}: {bad}")
            # show first diff
            for c, kind, *_ in bad[:1]:
                m = ~((g[c].isna() & e[c].isna()) | (g[c] == e[c]))
                i = m.idxmax()
                print(f"   first diff row {i}: got={g[c][i]!r} exp={e[c][i]!r}")
            fail += 1
        else:
            # dtype note
            dt = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
                  if str(g[c].dtype) != str(e[c].dtype)]
            note = f"  [dtype notes: {dt}]" if dt else ""
            print(f"OK   {name} ({len(g)} rows){note}")
            ok += 1
    for name, n in rows_only:
        print(f"ROWS {name}: {n} rows (no oracle)")
    print(f"\n{ok} ok, {fail} fail, {len(rows_only)} rows-only")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
