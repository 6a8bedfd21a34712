#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir>
  where <outDir> was produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`.

For each query result parquet in outDir, runs the matching oracle SQL
(outDir/oracle_sql.json) in DuckDB over the sfDir tables and compares:
row count, column names, and values (hash over rows sorted by all
columns, mirroring a column-name-sorted, order-insensitive compare).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows):
    out = []
    for r in rows:
        out.append(tuple(repr(v) for v in r))
    return sorted(out)

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # a query that failed inside Verify leaves no dump — without this, a
    # throwing query would silently vanish from the gate (it happened:
    # a q with an unresolved column still showed "N/N pass")
    for name in oracles:
        if name not in names:
            results[name] = "MISSING-DUMP (query threw in Verify?)"
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            results[name] = "EMPTY-RESULT-DIR"
            continue
        got_rel = con.sql(f"SELECT * FROM '{files[0]}'")
        got_cols = sorted(got_rel.columns)
        got = con.execute(
            f"SELECT {', '.join(got_cols)} FROM '{files[0]}'").fetchall()
        if name not in oracles:
            results[name] = f"rows-only: {len(got)} rows " + \
                ("OK" if len(got) > 0 else "FAIL(0 rows)")
            continue
        try:
            exp_rel = con.sql(oracles[name])
            exp_cols = sorted(exp_rel.columns)
            exp = con.execute(
                f"SELECT {', '.join(exp_cols)} FROM ({oracles[name]})").fetchall()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {e}"
            continue
        if got_cols != exp_cols:
            results[name] = f"SCHEMA-MISMATCH spark={got_cols} duck={exp_cols}"
            continue
        if len(got) != len(exp):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(got)} duck={len(exp)}"
            continue
        g, e = canon(got), canon(exp)
        if g == e:
            results[name] = f"OK ({len(got)} rows)"
        else:
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            results[name] = f"VALUE-MISMATCH first-diffs={diff}"
    n_ok = sum(1 for v in results.values() if v.startswith("OK") or "rows-only" in v and "FAIL" not in v)
    for k, v in sorted(results.items()):
        status = "PASS" if (v.startswith("OK") or (v.startswith("rows-only") and "FAIL" not in v)) else "FAIL"
        print(f"[{status}] {k}: {v}")
    print(f"== {n_ok}/{len(results)} pass ==")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
