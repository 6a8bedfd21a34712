#!/usr/bin/env python3
"""Simulates the DRIVER's pandas-based hash compare, which is stricter
than tools/check.py's repr compare: the driver loads both sides into
pandas and hashes values, so a DuckDB HUGEINT (rendered float64/object)
against a Spark int64 hash-mismatches even when values are equal.

Usage: python3 tools/dtype_check.py <outDir> <sfDir>

For each oracle query, loads the Spark parquet (Verify coalesces to a
single part file) and the DuckDB oracle result as pandas frames and
reports any column whose dtype KIND differs (int vs float vs object)
or that holds array cells the driver's sorter cannot hash — the exact
failure modes behind round 6's q71/q76/q80/q81/q86/q91/q99 hash reds
and the q107 error. VALUE comparison is tools/check.py's job — run
both.
"""
import sys, os, json, glob, datetime
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    bad = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"[SKIP] {name}: no spark dump")
            continue
        spark_df = pd.read_parquet(files[0])
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error {e}")
            bad += 1
            continue
        issues = []
        for c in sorted(spark_df.columns):
            if c not in duck_df.columns:
                issues.append(f"missing col {c}")
                continue
            sk, dk = spark_df[c].dtype.kind, duck_df[c].dtype.kind
            nn = spark_df[c].dropna()
            if sk != dk and not (sk in "OU" and dk in "OU"):
                # date columns: parquet DATE loads as object-of-
                # datetime.date while DuckDB .df() yields datetime64 —
                # the driver's hasher handles this exact pair (q5
                # passes its real gate). `type(...) is` keeps the
                # exemption that narrow: datetime.datetime objects are
                # NOT waved through.
                is_date_pair = (sk == "O" and dk == "M" and len(nn)
                                and type(nn.iloc[0]) is datetime.date)
                if not is_date_pair:
                    issues.append(
                        f"{c}: spark={spark_df[c].dtype} "
                        f"duck={duck_df[c].dtype}")
            # the driver sort_values()-crashes on unhashable cells
            # (numpy arrays / lists) — q107's round-6 failure mode
            if len(nn) and (isinstance(nn.iloc[0], (list, tuple))
                            or type(nn.iloc[0]).__name__ == "ndarray"):
                issues.append(f"{c}: array-typed column (driver cannot sort)")
        if issues:
            print(f"[FAIL] {name}: " + "; ".join(issues))
            bad += 1
        else:
            print(f"[PASS] {name}")
    print(f"== {bad} dtype failures ==")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
