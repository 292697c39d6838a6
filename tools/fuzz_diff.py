"""Differential fuzz harness, DuckDB half (round-12 verdict item 8).

Replays every statement graft.tools.FuzzGen ran through LakeSql.sql in
DuckDB over the SAME raw parquet tables, and value-diffs the results
(same sorted-columns, stringified-rows compare as tools/parity.py).

Outcome classes:
  MATCH      both engines ran it, values identical
  DIFF       both ran it, values differ  -> a silent divergence. FAIL.
  SPARK_ONLY Spark ran it, DuckDB errored -> dialect asymmetry, listed
             for triage (the shared-dialect generator should prevent
             these; a hit usually means a generator bug, but it can
             also be a rewrite accepting text DuckDB refuses).
  refused/error entries from the Spark side are echoed for visibility
             (loud refusals are contract behavior, not divergences).

Also replays multi-statement SCRIPTS (graft.tools.FuzzScript): the
python client can't run a whole script in one execute(), so entries
split on ';' (the generators never put ';' inside a literal) and run
statement-by-statement, diffing the LAST statement's result; a failed
script rolls back any dangling transaction so scripts stay
independent.

Usage: python3 tools/fuzz_diff.py <sfDir> <fuzzOutDir>
Exit 1 iff any DIFF.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_script(con, sql):
    cur = None
    for st in sql.split(";"):
        if st.strip():
            cur = con.execute(st)
    return cur.fetchdf()


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    stmts = json.load(open(f"{outdir}/statements.json"))
    n_match = n_diff = n_sparkonly = n_refused = n_error = 0
    for name in sorted(stmts):
        sql, status = stmts[name]["sql"], stmts[name]["status"]
        if status.startswith("refused"):
            n_refused += 1
            continue
        if status.startswith("error"):
            n_error += 1
            print(f"SPARK_ERROR {name}: {status[:120]}\n  {sql}")
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"DIFF {name}: spark claimed ran but wrote no output")
            n_diff += 1
            continue
        try:
            want = run_script(con, sql)
        except Exception as e:
            try:
                con.execute("ROLLBACK")
            except Exception:
                pass
            n_sparkonly += 1
            print(f"SPARK_ONLY {name}: duckdb: {str(e)[:120]}\n  {sql}")
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc or len(got) != len(want):
            print(f"DIFF {name}: shape {gc}x{len(got)} vs {wc}x"
                  f"{len(want)}\n  {sql}")
            n_diff += 1
            continue
        g = sorted(map(tuple, got[gc].astype(str).values.tolist()))
        w = sorted(map(tuple, want[wc].astype(str).values.tolist()))
        if g != w:
            first = next((a, b) for a, b in zip(g, w) if a != b)
            print(f"DIFF {name}: first differing row spark={first[0]} "
                  f"duck={first[1]}\n  {sql}")
            n_diff += 1
            continue
        n_match += 1
    print(f"\nFUZZ_DIFF match={n_match} diff={n_diff} "
          f"spark_only={n_sparkonly} refused={n_refused} "
          f"spark_error={n_error}")
    return 1 if n_diff else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
