#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each testdata parquet as a
DuckDB view, runs every oracle query, and compares against the Spark
parquet dump in <verifyOutDir>/<name>/ — columns sorted by name, rows
sorted, exact value equality (floats via repr round-trip).
"""
import sys, json, glob, os
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output at {spark_glob}")
            failures += 1
            continue
        try:
            oracle_rows = con.sql(sql).fetchall()
            oracle_cols = [d[0] for d in con.sql(sql).description]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        got = con.sql(f"SELECT * FROM read_parquet('{spark_glob}')")
        got_rows, got_cols = got.fetchall(), [d[0] for d in got.description]
        if sorted(got_cols) != sorted(oracle_cols):
            print(f"FAIL {name}: columns spark={sorted(got_cols)} oracle={sorted(oracle_cols)}")
            failures += 1
            continue
        def norm(rows, cols):
            idx = sorted(range(len(cols)), key=lambda i: cols[i])
            return sorted(tuple(repr(r[i]) for i in idx) for r in rows)
        a, b = norm(got_rows, got_cols), norm(oracle_rows, oracle_cols)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)} first_diffs={diff}")
            failures += 1
        else:
            print(f"OK   {name}: {len(a)} rows")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
