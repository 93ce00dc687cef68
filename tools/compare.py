#!/usr/bin/env python3
"""Local pre-validation harness mimicking the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ (spark parquet result via pandas — the
driver's read path, so Spark DECIMAL comes back as decimal.Decimal objects)
and runs the matching oracle_sql.json entry in DuckDB (fetchdf — DECIMAL
comes back as float64). Values are compared as EXACT RENDERED STRINGS with
no numeric tolerance, which is what the real gate hashes. Consequences this
comparer is designed to surface (learned from round 1):

  * Decimal('139345.00') renders "139345.00" but float64 renders "139345.0"
    -> ANY decimal output column is a fail risk even when values are equal.
  * DuckDB HUGEINT (sum of BIGINT) -> float64 "9104.0" vs int64 "9104".
  * list/ndarray cells crash the driver's row sort -> reported as RISK.

Policy enforced here: gated outputs should be BIGINT / STRING / BOOLEAN /
TIMESTAMP only. float64 is tolerated ONLY when both sides derive it
bit-identically (reported as a WARN so the list stays reviewed).
"""
import sys, os, json, glob, math
from decimal import Decimal

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def render(v):
    """Exact string rendering of one cell — deliberately NOT normalizing
    Decimal vs float, mirroring the driver's hash of rendered values."""
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if v is pd.NaT:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (np.floating,)):
        return repr(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if hasattr(v, "isoformat"):  # timestamps/dates
        return str(pd.Timestamp(v))
    return str(v)


def risky_cells(df):
    """Columns whose dtype/content is a driver-gate landmine."""
    risks = []
    for c in df.columns:
        if df[c].dtype == object:
            sample = next((x for x in df[c] if x is not None), None)
            if isinstance(sample, Decimal):
                risks.append(f"{c}: DECIMAL (renders with trailing zeros)")
            elif isinstance(sample, (list, tuple, np.ndarray)):
                risks.append(f"{c}: ARRAY cell (crashes driver row sort)")
        elif df[c].dtype == np.float64:
            risks.append(f"{c}: float64 (ok only if bit-identical both engines)")
    return risks


def frame_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(render(v) for v in r) for r in df[cols].itertuples(index=False)]
    rows.sort()
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    result_dirs = sorted(d for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d))
    n_pass = n_fail = n_noracle = n_warn = 0
    for d in result_dirs:
        name = os.path.basename(d)
        if only and name not in only:
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"EMPTY  {name}: no parquet output")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        risks = risky_cells(spark_df)
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
        hard_risk = [r for r in risks if "ARRAY" in r or "DECIMAL" in r]
        sc, sr = frame_rows(spark_df)
        dc, dr = frame_rows(duck_df)
        if sc != dc:
            print(f"FAIL   {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL   {name}: row count spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = next(((i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b), None)
        if bad:
            print(f"FAIL   {name}: first diff at sorted-row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        elif hard_risk:
            print(f"RISK   {name}: values match TODAY but output dtypes are gate landmines: {hard_risk}")
            n_fail += 1
        else:
            floaty = [r for r in risks if "float64" in r]
            if floaty:
                print(f"WARN   {name}: {len(sr)} rows exact; float64 cols (bit-identical today): {floaty}")
                n_warn += 1
            else:
                print(f"PASS   {name}: {len(sr)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass ({n_warn} with float64 warns), {n_fail} fail, {n_noracle} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
