#!/usr/bin/env python3
"""Driver-faithful correctness gate: normalize BOTH sides through pandas
exactly like the driver's harness does, so representation divergences are
caught locally before the driver sees them.

Differences from tools/check.py (which uses fetchall() / to_pylist()):
  - the oracle result is materialized with duckdb's .df()  — this is where
    window-SUM HUGEINT silently becomes float64 (so "2000" vs "2000.0"
    hash mismatches surface here, as in the driver, and NOT in check.py);
  - the spark parquet is materialized with pyarrow's to_pandas() — list
    columns become numpy.ndarray cells;
  - rows are ordered with DataFrame.sort_values over all columns — this is
    the call that dies with "unhashable type: 'numpy.ndarray'" when a
    result still carries an array column (the driver's q62 failure mode).

Usage: python3 tools/check_pandas.py <sfDir> <outDir>
"""
import sys, os, json, hashlib
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon_df(df):
    """Sort columns by name, lexsort rows (the driver's sort_values path),
    stringify cells, hash. Raises on unhashable cells — by design."""
    df = df[sorted(df.columns)]
    if len(df.columns) and len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    out = []
    for row in df.itertuples(index=False, name=None):
        vals = []
        for v in row:
            if isinstance(v, float):
                v = repr(v)
            vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return hashlib.sha256("\x1e".join(out).encode()).hexdigest(), len(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            sdf = pq.read_table(res_dir).to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_fail += 1
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} "
                  f"duck={sorted(ddf.columns)}")
            n_fail += 1
            continue
        try:
            sh, sn = canon_df(sdf)
            dh, dn = canon_df(ddf)
        except Exception as e:
            print(f"FAIL {name}: err during pandas canon: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sn != dn:
            print(f"FAIL {name}: rows spark={sn} duck={dn}")
            n_fail += 1
        elif sh != dh:
            print(f"FAIL {name}: hash mismatch ({sn} rows)")
            scanon = sorted("\x1f".join(
                repr(v) if isinstance(v, float) else str(v) for v in row)
                for row in sdf[sorted(sdf.columns)].itertuples(index=False, name=None))
            dcanon = sorted("\x1f".join(
                repr(v) if isinstance(v, float) else str(v) for v in row)
                for row in ddf[sorted(ddf.columns)].itertuples(index=False, name=None))
            for a, b in zip(scanon, dcanon):
                if a != b:
                    print(f"  spark: {a[:200]}\n  duck : {b[:200]}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({sn} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
