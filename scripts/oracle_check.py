#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate — STRICT.

Reads each Spark dump in <outDir>/<name>/ (parquet) with pyarrow/pandas (the
way a driver-side hasher would: parquet DECIMAL -> decimal.Decimal objects),
runs the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB and
fetches it as a pandas frame (DuckDB DECIMAL -> float64), sorts columns by
name, and compares the *string rendering* of every value. This asymmetry is
deliberate: it reproduces the representation drift that made 10 value-identical
queries fail the round-2 driver hash (Decimal('377.40') vs float 377.4).

Additionally, any DECIMAL-typed column in either the Spark dump or the oracle
result is an immediate failure: no raw table carries decimals, so a decimal
output is always computed — and computed decimals are exactly the class the
driver's hasher renders differently per side. Policy: render them as VARCHAR
on both sides instead.

Usage:
    python3 scripts/oracle_check.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, json, glob

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pyarrow.types as pat

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def render(v):
    """One value -> comparison string. No rounding, no normalization."""
    if v is None or v != v:  # None / NaN
        return "<null>"
    if isinstance(v, float):
        return repr(v)
    return str(v)


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
            spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            spark_schema = pq.read_schema(files[0])
            dec_cols = [f.name for f in spark_schema if pat.is_decimal(f.type)]
            rel = con.sql(sql)
            o_dec = [c for c, t in zip(rel.columns, rel.types)
                     if "DECIMAL" in str(t).upper()]
            o_df = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failures += 1
            continue
        if dec_cols or o_dec:
            print(f"FAIL {name}: DECIMAL output columns (driver-hash risk) "
                  f"spark={dec_cols} oracle={o_dec} — render as VARCHAR on both sides")
            failures += 1
            continue
        spark_cols = sorted(spark_df.columns)
        o_cols = sorted(o_df.columns)
        if spark_cols != o_cols:
            print(f"FAIL {name}: columns spark={spark_cols} oracle={o_cols}")
            failures += 1
            continue
        if len(spark_df) != len(o_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} oracle={len(o_df)}")
            failures += 1
            continue
        a_rows = spark_df[spark_cols].itertuples(index=False, name=None)
        b_rows = o_df[o_cols].itertuples(index=False, name=None)
        bad = None
        for i, (a, b) in enumerate(zip(a_rows, b_rows)):
            ra, rb = tuple(map(render, a)), tuple(map(render, b))
            if ra != rb:
                bad = (i, ra, rb)
                break
        if bad:
            print(f"FAIL {name}: first diff at row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            failures += 1
        else:
            print(f"PASS {name}: {len(spark_df)} rows, {len(spark_cols)} cols")
    print(f"\n{len(oracles) - failures}/{len(oracles)} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
