#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/selfcheck.py [sfdir] [outdir]

Reads each query result parquet produced by `graft.Verify` from outdir,
runs the corresponding oracle SQL (outdir/oracle_sql.json) in DuckDB with
views named after the TESTDATA tables, and compares: schema (column name
set), row count, and cell-exact values after sorting columns by name and
rows lexicographically. Reports per-query PASS/FAIL plus first diffs.

Driver-side tooling only — the Scala engine never depends on this.
"""
import json, math, os, sys, glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    results = sorted(d for d in os.listdir(outdir)
                     if os.path.isdir(os.path.join(outdir, d)))
    for name in results:
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"EMPTY-RESULT {name}")
            n_fail += 1
            continue
        got_rel = con.sql(f"SELECT * FROM '{files[0]}'")
        g_cols, g_rows = canon(got_rel.fetchall(), got_rel.columns)
        if name not in oracle:
            print(f"NO-ORACLE {name}: rows={len(g_rows)} (rows-only check)")
            n_pass += 1
            continue
        try:
            exp_rel = con.sql(oracle[name])
            e_cols, e_rows = canon(exp_rel.fetchall(), exp_rel.columns)
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL error: {ex}")
            n_fail += 1
            continue
        if g_cols != e_cols:
            print(f"FAIL {name}: columns got={g_cols} exp={e_cols}")
            n_fail += 1
            continue
        if len(g_rows) != len(e_rows):
            print(f"FAIL {name}: rowcount got={len(g_rows)} exp={len(e_rows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g_rows, e_rows))
               if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(g_rows)} rows differ; "
                  f"first at {i}:\n  got {a}\n  exp {b}\n  cols {g_cols}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(g_rows)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
