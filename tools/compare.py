#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify output vs
DuckDB oracle on the same parquet tables. Usage:
  python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]
Not shipped in the engine — dev tool only (driver-side python is allowed
for verification tooling, not for the engine itself)."""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
        elif str(s.dtype).startswith("datetime"):
            df[c] = s.astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        qdir = f"{out_dir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        # dtype-tolerant exact value compare
        bad = None
        for c in got.columns:
            g, e = got[c], exp[c]
            try:
                import numpy as np
                if not (g.isna() == e.isna()).all():
                    bad = (c, "null mask"); break
                mask = ~g.isna()
                gv, ev = g[mask], e[mask]
                if str(g.dtype).startswith("float") or str(e.dtype).startswith("float"):
                    if not (gv.astype(float).values == ev.astype(float).values).all():
                        diff = abs(gv.astype(float).values - ev.astype(float).values)
                        i = diff.argmax()
                        bad = (c, f"max diff {diff.max()} e.g. {gv.values[i]} vs {ev.values[i]}")
                        break
                else:
                    if not (gv.astype(str).values == ev.astype(str).values).all():
                        neq = (gv.astype(str).values != ev.astype(str).values)
                        i = neq.argmax()
                        bad = (c, f"e.g. {gv.values[i]!r} vs {ev.values[i]!r}")
                        break
            except Exception as ex:
                bad = (c, f"compare error {ex}"); break
        if bad:
            print(f"FAIL {name}: col {bad[0]}: {bad[1]}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows, {len(got.columns)} cols)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
