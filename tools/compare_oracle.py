#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB with views over the
raw test parquet, and compares values (rows sorted, columns sorted by name).
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Only an EXPLICIT subset (same env var Verify honors) may skip missing
    # dumps; in a full gate run a missing dir means the query failed inside
    # Verify and must fail the gate.
    subset = {s.strip() for s in os.environ.get("SPARK_GRAFT_QUERIES", "").split(",") if s.strip()}
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if subset and name not in subset:
            n_skip += 1
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                f"SELECT {', '.join(spark_cols)} FROM spark_rel ORDER BY ALL").fetchall()
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            duck_rows = con.sql(
                f"SELECT {', '.join(duck_cols)} FROM duck_rel ORDER BY ALL").fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception: {e}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns {spark_cols} vs {duck_cols}")
            n_fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rowcount {len(spark_rows)} vs {len(duck_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
            if tuple(map(canon, a)) != tuple(map(canon, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    skipped = f", {n_skip} not dumped (subset run)" if n_skip else ""
    print(f"\n{n_pass} pass, {n_fail} fail{skipped}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
