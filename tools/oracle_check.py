#!/usr/bin/env python3
"""Local pre-check that mirrors the driver's correctness gate:
run graft.Verify (Spark) into an outDir, then run each oracle SQL in
DuckDB over the same parquet tables and compare row-by-row.

Usage: python3 tools/oracle_check.py <sfDir> <outDir> [query ...]
(Verify must already have populated outDir.)
Dev tool only — the shipped Scala library has no Python dependency.
"""
import sys, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(rows, cols):
    # sort columns by name (like the driver), then rows
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)  # full precision
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out), [cols[i] for i in idx]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        # driver testdata ships single files; ScaleGen corpora are
        # directories of part files — glob when it's a directory
        import os
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            # The driver's pandas harness lexsorts every output column and
            # cannot hash ndarray cells — reject nested output up front so
            # this mirror fails exactly where the driver gate would.
            desc = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
            nested = [(c, t) for c, t, *_ in desc
                      if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST"))]
            if nested:
                print(f"FAIL {name}: nested output columns (driver harness cannot sort them): {nested}")
                n_fail += 1
                continue
            s = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [d[0] for d in s.description]
            s_rows = s.fetchall()
            d = con.execute(sql)
            d_cols = [d_[0] for d_ in d.description]
            d_rows = d.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
            n_fail += 1
            continue
        sn, cols = normalize(s_rows, s_cols)
        dn, _ = normalize(d_rows, d_cols)
        if sn == dn:
            print(f"PASS {name} ({len(sn)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows spark={len(sn)} duck={len(dn)}")
            for i, (a, b) in enumerate(zip(sn, dn)):
                if a != b:
                    print(f"  first diff at row {i} (cols {cols}):\n   spark={a}\n   duck ={b}")
                    break
            else:
                if len(sn) != len(dn):
                    longer, which = (sn, "spark") if len(sn) > len(dn) else (dn, "duck")
                    print(f"  extra {which} row: {longer[min(len(sn), len(dn))]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
