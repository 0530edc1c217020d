#!/usr/bin/env python3
"""Timeout-aware variant of selfcheck.py for big scale factors.

Usage: python3 tools/sweep.py [sfdir] [outdir] [timeout_s]

Same compare as tools/selfcheck.py (schema / rowcount / cell-exact after
canonical sort), but each oracle runs in its own subprocess with a time
limit: a handful of oracles are deliberately quadratic (exact all-pairs
ground truth for the dedup-cluster family) and intractable in DuckDB at
sf0.1, while the engine side runs fine. Those report ORACLE-TIMEOUT
(engine output exists and is row-counted) instead of hanging the sweep.

Driver-side tooling only — the Scala engine never depends on this.
"""
import json, os, subprocess, sys

CHILD = """
import json, math, sys, glob
import duckdb
sfdir, outdir, name = sys.argv[1], sys.argv[2], sys.argv[3]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

files = glob.glob(f"{outdir}/{name}/*.parquet")
if not files:
    print(f"EMPTY-RESULT {name}"); sys.exit(1)
got = con.sql(f"SELECT * FROM '{files[0]}'")
g_cols, g_rows = canon(got.fetchall(), got.columns)
if name not in oracle:
    print(f"NO-ORACLE {name}: rows={len(g_rows)} (rows-only check)"); sys.exit(0)
exp = con.sql(oracle[name])
e_cols, e_rows = canon(exp.fetchall(), exp.columns)
if g_cols != e_cols:
    print(f"FAIL {name}: columns got={g_cols} exp={e_cols}"); sys.exit(1)
if len(g_rows) != len(e_rows):
    print(f"FAIL {name}: rowcount got={len(g_rows)} exp={len(e_rows)}"); sys.exit(1)
bad = [i for i, (a, b) in enumerate(zip(g_rows, e_rows)) if a != b]
if bad:
    i = bad[0]
    print(f"FAIL {name}: {len(bad)}/{len(g_rows)} rows differ; first at {i}:")
    print(f"  got {g_rows[i]}")
    print(f"  exp {e_rows[i]}")
    sys.exit(1)
print(f"PASS {name}: {len(g_rows)} rows")
"""


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf01"
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 180
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = n_to = 0
    for name in names:
        try:
            r = subprocess.run(
                [sys.executable, "-c", CHILD, sfdir, outdir, name],
                capture_output=True, text=True, timeout=timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            sys.stdout.write(r.stdout or f"FAIL {name}: {r.stderr.strip()[:300]}\n")
            if r.returncode == 0:
                n_pass += 1
            else:
                n_fail += 1
        except subprocess.TimeoutExpired:
            print(f"ORACLE-TIMEOUT {name} (> {timeout}s in DuckDB; "
                  f"engine output present)")
            n_to += 1
        sys.stdout.flush()
    print(f"\n{n_pass} pass, {n_fail} fail, {n_to} oracle-timeout")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
