#!/usr/bin/env python3
"""Local correctness loop: mimic the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet result written by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB with every synthetic
table registered as a view, and compares at the DRIVER's bar (round-3
lesson: a tolerant untyped compare here let 13 rows ship that the driver
scored red):

  1. TYPED schema compare — the DuckDB-inferred column type of the oracle
     result must equal the type of the Spark parquet column (sorted by
     name). HUGEINT-vs-BIGINT or TIMESTAMP-vs-DATE is a FAIL even when
     every value matches.
  2. No DECIMAL/HUGEINT in EITHER side's output — the driver's hasher
     cannot canonicalize them across engines even at identical declared
     types. Keep decimals internal; surface BIGINT cents / DOUBLE /
     VARCHAR digits.
  3. Exact value equality — no float tolerance. The driver hashes bits;
     210 green r3 queries prove both engines agree bit-for-bit when the
     plan mirrors the arithmetic, so a 1e-9 miss is a real defect.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BANNED_TYPES = ("DECIMAL", "HUGEINT")


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def eq(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, (int, float)):
        return a == float(b)
    if isinstance(b, float) and isinstance(a, int):
        return float(a) == b
    return a == b


def described_types(con, sql):
    """{column: duckdb type} for a query, via DESCRIBE."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


def register_views(con, sf_dir):
    for t in TABLES:
        # Driver corpora are single parquet FILES; ScaleUp probe corpora
        # (/tmp/sf1, /tmp/sf10) are parquet DIRECTORIES — register either.
        src = f"{sf_dir}/{t}.parquet"
        rel = (f"read_parquet('{src}/*.parquet')" if os.path.isdir(src)
               else f"'{src}'")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {rel}")


def neardup_slice(sf_dir, out_dir):
    """Partitioned-oracle verification of t_dedup_savings (round 14).

    The registered oracle replays the whole near-dup funnel in DuckDB —
    infeasible at sf10 (>76 GB spill). This mode verifies the same
    query in two bit-exact halves against the graft.DedupSlice dump:

      A. PAIR SLICE — DuckDB replays the oracle's minhash→bands→
         candidates→jaccard chain restricted to pairs touching docs in
         one deterministic bucket (doc_id % K = bucket; the a-side of
         the band join is sliced, the b-side is the full corpus), and
         the Spark pair table filtered to the same predicate must match
         it exactly, jaccard doubles included.
      B. SAVINGS REPLAY — an independent union-find (min-id keeper,
         the connectedComponents contract) over the FULL Spark pair
         table plus DuckDB token counts rebuilds the savings row, which
         must equal the registered t_dedup_savings output bit-for-bit.

    Together the pair table is oracle-checked on a 1/K slice and
    everything downstream of the pairs on the full table.
    """
    con = duckdb.connect()
    register_views(con, sf_dir)
    meta = json.load(open(f"{out_dir}/slice_oracle.json"))
    k, bucket = meta["k"], meta["bucket"]
    n_fail = 0

    # ---- A: the pair slice, DuckDB replay vs Spark pair table. ----
    want = con.execute(meta["pair_slice_sql"]).fetchall()
    got = con.execute(
        f"SELECT id_a, id_b, jac FROM "
        f"read_parquet('{out_dir}/neardup_pairs/*.parquet') "
        f"WHERE id_a % {k} = {bucket} OR id_b % {k} = {bucket}"
    ).fetchall()
    ws, gs = sorted(want), sorted(got)
    if len(ws) != len(gs):
        print(f"FAIL pair_slice: spark {len(gs)} pairs vs oracle {len(ws)}")
        n_fail += 1
    else:
        bad = [(g, w) for g, w in zip(gs, ws)
               if not all(eq(a, b) for a, b in zip(g, w))]
        if bad:
            print(f"FAIL pair_slice: first diff got {bad[0][0]} "
                  f"want {bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS pair_slice ({len(gs)} pairs, K={k}, "
                  f"bucket={bucket})")

    # ---- B: savings from the FULL pair table via union-find. ----
    pairs = con.execute(
        f"SELECT id_a, id_b FROM "
        f"read_parquet('{out_dir}/neardup_pairs/*.parquet')").fetchall()
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo  # min-id root == connectedComponents keeper
    dropped = sorted(x for x in parent if find(x) != x)
    con.execute(f"CREATE TEMP TABLE tok AS {meta['tok_sql']}")
    con.execute("CREATE TEMP TABLE dropped (doc_id BIGINT)")
    if dropped:
        con.executemany("INSERT INTO dropped VALUES (?)",
                        [(int(x),) for x in dropped])
    n_docs, n_tokens = con.execute(
        "SELECT count(*), sum(n_tok) FROM tok").fetchone()
    n_drop, t_drop = con.execute(
        "SELECT count(*), coalesce(sum(n_tok), 0) FROM tok "
        "JOIN dropped USING (doc_id)").fetchone()
    n_kept, t_kept = n_docs - n_drop, n_tokens - t_drop
    want_row = (n_docs, n_kept, n_tokens, t_kept,
                float(n_docs - n_kept) / float(n_docs),
                float(n_tokens - t_kept) / float(n_tokens))
    got_row = con.execute(
        "SELECT n_docs, n_docs_kept, n_tokens, n_tokens_kept, "
        "doc_savings, token_savings FROM "
        f"read_parquet('{out_dir}/t_dedup_savings/*.parquet')").fetchone()
    if all(eq(a, b) for a, b in zip(got_row, want_row)):
        print(f"PASS savings_replay ({len(pairs)} pairs, "
              f"{len(dropped)} dropped) {got_row}")
    else:
        print(f"FAIL savings_replay: got {got_row} want {want_row}")
        n_fail += 1
    print(f"== neardup_slice {2 - n_fail} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


def knn_slice(sf_dir, out_dir, k=64, bucket=0):
    """Partitioned-oracle verification of sim_knn_join (round 14).

    The registered oracle trains IVF centroids (cheap, kept whole) and
    then joins every query vector against its cell's members — at sf10
    that final join materializes >56 GB of DuckDB temp and dies of
    disk. The knn output is windowed PER q_id, so restricting the
    oracle's q-side to one deterministic bucket (vec_id % K = bucket)
    is EXACT for the rows it keeps: the n-side, the trained centroids,
    and each kept query's candidate set are untouched. The slice SQL
    is the registered oracle text with the one q CTE filtered — a
    single surgical substitution, asserted unique so oracle drift
    fails loudly instead of silently diverging.
    """
    con = duckdb.connect()
    register_views(con, sf_dir)
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["sim_knn_join"]
    pat = "q AS (SELECT vec_id AS q_id, cell, e AS q_vec FROM aF)"
    if sql.count(pat) != 1:
        print(f"FAIL knn_slice: expected exactly one q CTE "
              f"'{pat}' in the registered oracle, found {sql.count(pat)}")
        sys.exit(1)
    sliced = sql.replace(
        pat, "q AS (SELECT vec_id AS q_id, cell, e AS q_vec FROM aF "
             f"WHERE vec_id % {k} = {bucket})")
    want = sorted(con.execute(sliced).fetchall())
    got = sorted(con.execute(
        "SELECT q_id, n_id, cos, rank FROM "
        f"read_parquet('{out_dir}/sim_knn_join/*.parquet') "
        f"WHERE q_id % {k} = {bucket}").fetchall())
    if len(got) != len(want):
        print(f"FAIL knn_slice: spark {len(got)} rows vs oracle "
              f"{len(want)}")
        sys.exit(1)
    bad = [(g, w) for g, w in zip(got, want)
           if not all(eq(a, b) for a, b in zip(g, w))]
    if bad:
        print(f"FAIL knn_slice: first diff got {bad[0][0]} "
              f"want {bad[0][1]}")
        sys.exit(1)
    print(f"PASS knn_slice ({len(got)} rows, K={k}, bucket={bucket})")
    sys.exit(0)


def main():
    if sys.argv[1] == "--neardup-slice":
        neardup_slice(sys.argv[2], sys.argv[3])
        return
    if sys.argv[1] == "--knn-slice":
        # Optional argv[4]/argv[5] = K / bucket, mirroring DedupSlice
        # and the neardup mode (round-15 advice fix: these used to be
        # hardcoded to the 64/0 defaults).
        knn_slice(sys.argv[2], sys.argv[3],
                  k=int(sys.argv[4]) if len(sys.argv) > 4 else 64,
                  bucket=int(sys.argv[5]) if len(sys.argv) > 5 else 0)
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    register_views(con, sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_sql = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            got_t = described_types(con, spark_sql)
            want_t = described_types(con, f"({sql})")
            if sorted(got_t) != sorted(want_t):
                print(f"FAIL {name}: columns {sorted(got_t)} "
                      f"vs oracle {sorted(want_t)}")
                n_fail += 1
                continue
            type_bad = [
                f"{c}: spark {got_t[c]} vs oracle {want_t[c]}"
                for c in sorted(got_t) if got_t[c] != want_t[c]]
            banned = [
                f"{c}: {ty}" for side in (got_t, want_t)
                for c, ty in sorted(side.items())
                if any(b in ty for b in BANNED_TYPES)]
            if type_bad or banned:
                for m in type_bad:
                    print(f"FAIL {name}: TYPE mismatch {m}")
                for m in sorted(set(banned)):
                    print(f"FAIL {name}: unhashable output type {m} "
                          "(driver cannot canonicalize DECIMAL/HUGEINT)")
                n_fail += 1
                continue
            got = con.execute(spark_sql).fetchdf()
            want = con.execute(sql).fetchdf()
            got = got.reindex(sorted(got.columns), axis=1)
            want = want.reindex(sorted(want.columns), axis=1)
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
