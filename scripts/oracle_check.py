#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Reads each Spark dump in <outDir>/<name>/ (parquet), runs the matching oracle
SQL from <outDir>/oracle_sql.json in DuckDB over the sf tables, sorts columns
by name, and compares row-by-row. Usage:

    python3 scripts/oracle_check.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, json, glob, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return str(v)
    except Exception:
        pass
    return v


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark dump")
            failures += 1
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                f"SELECT {', '.join(spark_cols)} FROM read_parquet({files!r})").fetchall()
            o = con.sql(sql)
            o_cols = sorted(o.columns)
            o_rows = con.sql(
                f"SELECT {', '.join(o_cols)} FROM ({sql})").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failures += 1
            continue
        if spark_cols != o_cols:
            print(f"FAIL {name}: columns spark={spark_cols} oracle={o_cols}")
            failures += 1
            continue
        if len(spark_rows) != len(o_rows):
            print(f"FAIL {name}: rows spark={len(spark_rows)} oracle={len(o_rows)}")
            failures += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(spark_rows, o_rows)):
            if tuple(map(norm, a)) != tuple(map(norm, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: first diff at row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            failures += 1
        else:
            print(f"PASS {name}: {len(spark_rows)} rows, {len(spark_cols)} cols")
    print(f"\n{len(oracles) - failures}/{len(oracles)} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
