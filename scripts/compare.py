#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes <out>/<query>.parquet + <out>/oracle_sql.json), then this script runs
each oracle SQL in DuckDB over the same testdata parquet tables and compares
row sets (columns sorted by name, rows sorted, values hashed after
normalization). Usage: compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        # driver-style canonicalization; engine queries already round
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_glob:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({spark_glob!r})").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gc, gr = canon(got)
        wc, wr = canon(want)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
        elif gr != wr:
            diffs = [i for i, (a, b) in enumerate(zip(gr, wr)) if a != b][:3]
            print(f"FAIL {name}: {len(gr)} vs {len(wr)} rows; first diffs:")
            for i in diffs:
                print(f"  got[{i}]={gr[i]}\n  want[{i}]={wr[i]}")
            if len(gr) != len(wr):
                print(f"  row count mismatch")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
