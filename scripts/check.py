#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the fixture tables, compare against the parquet written by
graft.Verify. Usage: check.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
names = sorted(d for d in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, d)))
fails = []
for name in names:
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        print(f"{name:24s} NO-OUTPUT"); fails.append(name); continue
    got = con.execute(f"SELECT * FROM '{files[0]}'").df()
    if name not in oracle:
        print(f"{name:24s} rows-only ({len(got)} rows)" + (" EMPTY!" if len(got)==0 else ""))
        if len(got) == 0: fails.append(name)
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name:24s} ORACLE-ERROR {str(e)[:120]}"); fails.append(name); continue
    ok = True; why = ""
    if sorted(got.columns) != sorted(exp.columns):
        ok, why = False, f"cols {list(got.columns)} vs {list(exp.columns)}"
    elif len(got) != len(exp):
        ok, why = False, f"rows {len(got)} vs {len(exp)}"
    else:
        # driver-style: sort columns by name, compare values
        g = got[sorted(got.columns)].reset_index(drop=True)
        e = exp[sorted(exp.columns)].reset_index(drop=True)
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            if str(g[c].dtype) != str(e[c].dtype):
                ok = False
                why += f" dtype[{c}]:{g[c].dtype}vs{e[c].dtype}"
            mism = [i for i,(a,b) in enumerate(zip(gv,ev))
                    if a != b and not (a is None and b is None)
                    and not (isinstance(a,float) and isinstance(b,float)
                             and (a!=a and b!=b or a==b))]
            if mism:
                i = mism[0]
                ok, why = False, why + f" val[{c}]@{i}: {gv[i]!r} vs {ev[i]!r} ({len(mism)} diffs)"
    print(f"{name:24s} {'OK' if ok else 'FAIL'} {why}")
    if not ok: fails.append(name)
print(f"\n{len(names)-len(fails)}/{len(names)} pass; fails: {fails}")
sys.exit(1 if fails else 0)
