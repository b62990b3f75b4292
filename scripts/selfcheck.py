#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/selfcheck.py [sfDir] [outDir]

1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run
   (or runs it with --run)
2. loads each <outDir>/<name> parquet result
3. runs the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB with
   views over the sfDir parquet tables
4. compares: column names (sorted), row counts, and values
   (rows sorted by all columns; exact for non-floats, 1e-9 rel for floats)
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    return v


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    # Mirror the driver's typed hash: int vs float is a mismatch even when
    # numerically equal (e.g. DuckDB HUGEINT->float64 100.0 vs Spark 100).
    if isinstance(a, float) != isinstance(b, float):
        return False
    return a == b


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
    if "--run" in sys.argv:
        subprocess.run(["sbt", "-batch",
                        f"runMain graft.Verify {sf_dir} {out_dir}"],
                       check=True, cwd="/root/repo")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        rdir = out_dir / name
        if not rdir.exists():
            print(f"FAIL {name}: no spark result written")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{rdir}/*.parquet')").fetchdf()
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
            continue
        g = got[gc].values.tolist()
        w = want[wc].values.tolist()
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        g = sorted((tuple(norm(v) for v in r) for r in g), key=str)
        w = sorted((tuple(norm(v) for v in r) for r in w), key=str)
        bad = None
        for i, (rg, rw) in enumerate(zip(g, w)):
            if not all(eq(a, b) for a, b in zip(rg, rw)):
                bad = (i, rg, rw)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: got {bad[1]} want {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
