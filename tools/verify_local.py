#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (builder-side tooling,
not part of the engine): run graft.Verify via sbt, then compare each
query's parquet output against DuckDB executing the oracle SQL on the
same tables. Exact compare: sort columns by name, sort rows, compare
values (doubles must match to 1e-12 rel; everything else exact).

Usage: python3 tools/verify_local.py [sfDir] [--skip-run] [names...]
"""
import json
import math
import subprocess
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.001"
OUT = "/tmp/graft_verify"
ONLY = [a for a in sys.argv[2:] if not a.startswith("--")]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_verify():
    names = " ".join(ONLY)
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT} {names}'.strip()]
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    sys.stdout.write("\n".join(l for l in r.stdout.splitlines() if "[verify]" in l or "error" in l.lower()) + "\n")
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-2000:]); sys.exit(1)


def norm(v):
    """Normalize for cross-engine compare: nulls (None or NaN-promoted)
    collapse, all numerics go through float (uids < 2^53 stay exact)."""
    import numpy as np
    if v is None:
        return None
    if isinstance(v, (float, np.floating)):
        return None if math.isnan(v) else float(v)
    if isinstance(v, (int, np.integer)) and not isinstance(v, bool):
        return float(v)
    return v


def sort_key(row):
    return tuple("" if v is None else str(v) for v in row)


def compare(name, sql, con):
    import glob
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        return "NO_OUTPUT"
    got = con.execute(f"SELECT * FROM parquet_scan({files!r})").fetchdf()
    want = con.execute(sql).fetchdf()
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        return f"SCHEMA got={gcols} want={wcols}"
    got, want = got[gcols], want[wcols]
    if len(got) != len(want):
        return f"ROWS got={len(got)} want={len(want)}"
    gr = sorted([tuple(norm(v) for v in row) for row in got.itertuples(index=False)], key=sort_key)
    wr = sorted([tuple(norm(v) for v in row) for row in want.itertuples(index=False)], key=sort_key)
    for i, (g, w) in enumerate(zip(gr, wr)):
        for a, b in zip(g, w):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if abs(a - b) > 1e-12 * max(1.0, abs(a), abs(b)):
                    return f"VALUE row{i} {g} != {w}"
            elif str(a) != str(b):
                return f"VALUE row{i} {g} != {w}"
    return "OK"


def main():
    if "--skip-run" not in sys.argv:
        run_verify()
    con = duckdb.connect()
    for tname in TABLES:
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM parquet_scan('{SF}/{tname}.parquet')")
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracles.items()):
        if ONLY and name not in ONLY:
            continue
        try:
            res = compare(name, sql, con)
        except Exception as e:
            res = f"ERROR {type(e).__name__}: {e}"
        flag = "PASS" if res == "OK" else "FAIL"
        if res != "OK":
            bad += 1
        print(f"{flag} {name}: {res}")
    print(f"{'ALL GREEN' if bad == 0 else f'{bad} FAILURES'}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
