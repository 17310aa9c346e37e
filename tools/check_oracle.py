#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on each oracle_sql.json entry over the fixture tables and
compares against the parquet Verify dumped. Mimics the driver: sort
columns by name, sort rows, compare values. Strict equality here means
we can't be worse than whatever tolerance the driver applies.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    import datetime, decimal, math
    import numpy as np
    if isinstance(v, np.ndarray):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, np.generic):
        v = v.item()  # float64 keeps float64-ness; int64 -> int
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v

def fetch_sorted(rel, via_pandas=False):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    if via_pandas:
        # Mirror the driver: it pulls DuckDB results through pandas, where
        # HUGEINT (e.g. sum()/list_sum() of ints) degrades to float64 and
        # hash-mismatches Spark's int64. Surfaced as r01 x04/x13 failures.
        df = rel.df()
        rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
    else:
        rows = rel.fetchall()
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            # driver fixtures are flat files; Spark-written tables
            # (e.g. tools/ScaleUp output) are directories of part files
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {spark_dir}")
            n_fail += 1
            continue
        try:
            scols, srows = fetch_sorted(
                con.sql(f"SELECT * FROM read_parquet({files!r})"))
            ocols, orows = fetch_sorted(con.sql(oracle[name]), via_pandas=True)
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} != {ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} != {len(orows)}")
            print(f"  spark[0:2]={srows[:2]}\n  duck[0:2]={orows[:2]}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(srows, orows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first:")
            print(f"  spark={bad[0][0]}\n  duck ={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
