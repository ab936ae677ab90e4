#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
outputs against the DuckDB oracle SQL and compare row/schema/values.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, os, json, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, colnames):
    """Sort columns by name, normalize values, sort rows, hash."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
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
            duck = con.execute(sql)
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        tbl = pq.read_table(res_dir)
        scols = tbl.column_names
        cols_data = [tbl.column(j).to_pylist() for j in range(tbl.num_columns)]
        srows = list(zip(*cols_data)) if cols_data else []
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            n_fail += 1
            continue
        sh, sn = canon(srows, scols)
        dh, dn = canon(drows, dcols)
        if sn != dn:
            print(f"FAIL {name}: rows spark={sn} duck={dn}")
            n_fail += 1
        elif sh != dh:
            print(f"FAIL {name}: hash mismatch ({sn} rows)")
            # show first differing row for debugging
            ss = sorted("\x1f".join(map(str, r)) for r in srows)
            dd = sorted("\x1f".join(map(str, r)) for r in drows)
            for a, b in zip(ss, dd):
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
