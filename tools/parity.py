#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/parity.py <sfdir> <verify_out>

Loads each <verify_out>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the raw tables, and
compares: column names (sorted), dtypes, row counts, and exact values
(rows sorted). Prints per-query PASS/FAIL with the first diff.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_dir = f"{outdir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs {wc}"); n_fail += 1; continue
        got, want = got[gc], want[wc]
        gt = [str(t) for t in got.dtypes]; wt = [str(t) for t in want.dtypes]
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1
            continue
        g = sorted(map(tuple, got.astype(str).values.tolist()))
        w = sorted(map(tuple, want.astype(str).values.tolist()))
        if g != w:
            diffs = [(a, b) for a, b in zip(g, w) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: "
                  f"spark={diffs[0][0]} duck={diffs[0][1]}")
            n_fail += 1
            continue
        note = "" if gt == wt else f"  [dtype note: {gt} vs {wt}]"
        print(f"PASS {name} ({len(got)} rows){note}")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
