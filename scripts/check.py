#!/usr/bin/env python3
"""Local correctness loop: mimic the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet result written by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB with every synthetic
table registered as a view, sorts columns by name and rows by all columns,
and diffs cell values (floats to 1e-9 relative).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def eq(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, (int, float)):
        if a == b:
            return True
        return math.isclose(a, float(b), rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(b, float) and isinstance(a, int):
        return eq(b, a)
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchdf()
            want = con.execute(sql).fetchdf()
            got = got.reindex(sorted(got.columns), axis=1)
            want = want.reindex(sorted(want.columns), axis=1)
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} "
                      f"vs oracle {list(want.columns)}")
                n_fail += 1
                continue
            gr = sorted(map(tuple, got.itertuples(index=False)),
                        key=lambda r: tuple(str(x) for x in r))
            wr = sorted(map(tuple, want.itertuples(index=False)),
                        key=lambda r: tuple(str(x) for x in r))
            if len(gr) != len(wr):
                print(f"FAIL {name}: {len(gr)} rows vs oracle {len(wr)}")
                n_fail += 1
                continue
            bad = None
            for i, (g, w) in enumerate(zip(gr, wr)):
                if not all(eq(a, b) for a, b in zip(g, w)):
                    bad = (i, g, w)
                    break
            if bad:
                print(f"FAIL {name}: row {bad[0]}\n  got  {bad[1]}\n"
                      f"  want {bad[2]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(gr)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
