#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load each Verify
parquet result, run the corresponding oracle SQL in DuckDB over the same
sf dir, sort columns by name + rows, and compare values exactly.
Usage: compare.py <sfdir> <verify_out_dir>
"""
import json, sys, math
import duckdb
import pandas as pd

sfdir, vout = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{vout}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        got = pd.read_parquet(f"{vout}/{name}")
    except Exception as e:
        fails.append(name); print(f"{name}: SPARK OUTPUT MISSING ({e})"); continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append(name); print(f"{name}: ORACLE SQL FAIL: {str(e)[:300]}"); continue
    ok = True
    if got.shape[0] != exp.shape[0]:
        print(f"{name}: ROWS got={got.shape[0]} exp={exp.shape[0]}"); ok = False
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"{name}: COLS got={gc} exp={ec}"); ok = False
    if ok:
        g = got[gc].sort_values(gc).reset_index(drop=True)
        e = exp[gc].sort_values(gc).reset_index(drop=True)
        for c in gc:
            gv, ev = g[c], e[c]
            if str(gv.dtype) != str(ev.dtype):
                print(f"{name}: DTYPE {c}: got={gv.dtype} exp={ev.dtype}")
                ok = False
            try:
                if gv.dtype.kind == 'f':
                    eq = ((gv.isna() & ev.isna()) | (gv == ev))
                    if not eq.all():
                        bad = (~eq).idxmax()
                        print(f"{name}: VAL {c} row{bad}: got={gv[bad]!r} exp={ev[bad]!r} (n_bad={(~eq).sum()})")
                        ok = False
                else:
                    eq = (gv.isna() & ev.isna()) | (gv.astype(str) == ev.astype(str))
                    if not eq.all():
                        bad = (~eq).idxmax()
                        print(f"{name}: VAL {c} row{bad}: got={gv[bad]!r} exp={ev[bad]!r} (n_bad={(~eq).sum()})")
                        ok = False
            except Exception as ex:
                print(f"{name}: CMP ERR {c}: {ex}"); ok = False
    if not ok:
        fails.append(name)
    else:
        print(f"{name}: OK ({got.shape[0]} rows)")
print(f"\n=== {len(oracle)-len(fails)}/{len(oracle)} green; fails: {fails}")
