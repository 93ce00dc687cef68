#!/usr/bin/env python3
"""Local pre-validation harness mimicking the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ (spark parquet result) and runs the
matching oracle_sql.json entry in DuckDB against views named after the
tables in <sfDir>. Compares: columns sorted by name, rows sorted by all
columns, exact value equality (NaN==NaN, None==None, Decimal==float by
value). Prints PASS/FAIL per query.
"""
import sys, os, json, glob, math
from decimal import Decimal

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return v
    if hasattr(v, "isoformat"):  # timestamps/dates
        return str(pd.Timestamp(v))
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    return v


def sort_repr(x):
    # floats sort by a tolerance-consistent representation so that
    # 0.30000000000000004 and 0.3 land at the same position in both frames
    if isinstance(x, float):
        return f"{x:.9e}"
    if isinstance(x, tuple):
        return str(tuple(sort_repr(v) for v in x))
    return str(x)


def frame_key(df):
    cols = sorted(df.columns)
    rows = []
    for _, r in df[cols].iterrows():
        rows.append(tuple(norm_cell(v) for v in r))
    rows.sort(key=lambda t: tuple((x is None, str(type(x)), sort_repr(x)) for x in t))
    return cols, rows


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    result_dirs = sorted(d for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d))
    n_pass = n_fail = n_noracle = 0
    for d in result_dirs:
        name = os.path.basename(d)
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"EMPTY  {name}: no parquet output")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            print(f"NO-ORACLE {name}: rows={len(spark_df)} (rows-only check)")
            n_noracle += 1
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL   {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sc, sr = frame_key(spark_df)
        dc, dr = frame_key(duck_df)
        if sc != dc:
            print(f"FAIL   {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL   {name}: row count spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, dr)):
            if not cells_equal(a, b):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL   {name}: first diff at sorted-row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS   {name}: {len(sr)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
