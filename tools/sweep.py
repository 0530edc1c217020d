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


def run_one(args):
    sfdir, outdir, timeout, name = args
    try:
        r = subprocess.run(
            [sys.executable, "-c", CHILD, sfdir, outdir, name],
            capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        out = r.stdout or f"FAIL {name}: {r.stderr.strip()[:300]}\n"
        return (name, "pass" if r.returncode == 0 else "fail", out)
    except subprocess.TimeoutExpired:
        return (name, "timeout",
                f"ORACLE-TIMEOUT {name} (> {timeout}s in DuckDB; "
                f"engine output present)\n")


def main():
    # worker pool: each oracle is a single-threaded DuckDB subprocess, so
    # the sweep parallelizes embarrassingly — sequential, the sf0.1 suite
    # is hours (231 oracles, several legitimately slow); pooled it's
    # minutes. Worker count via SWEEP_WORKERS (default: half the cores,
    # leaving headroom so the sweep can run beside a round close).
    from concurrent.futures import ThreadPoolExecutor
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf01"
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 180
    workers = int(os.environ.get("SWEEP_WORKERS", max(1, (os.cpu_count() or 2) // 2)))
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    counts = {"pass": 0, "fail": 0, "timeout": 0}
    with ThreadPoolExecutor(max_workers=workers) as pool:
        for _, status, out in pool.map(
                run_one, [(sfdir, outdir, timeout, n) for n in names]):
            counts[status] += 1
            sys.stdout.write(out)
            sys.stdout.flush()
    print(f"\n{counts['pass']} pass, {counts['fail']} fail, "
          f"{counts['timeout']} oracle-timeout")
    sys.exit(1 if counts["fail"] else 0)


if __name__ == "__main__":
    main()
