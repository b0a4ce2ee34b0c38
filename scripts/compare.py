#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes <out>/<query>.parquet + <out>/oracle_sql.json), then this script runs
each oracle SQL in DuckDB over the same testdata parquet tables and compares
row sets (columns sorted by name, rows sorted, values hashed after
normalization). Usage: compare.py <sfDir> <verifyOutDir>

Values are fetched with fetchall(), NOT pandas .df(): pandas silently coerces
DECIMAL to float64, which masked a real driver failure (q50's score column was
DECIMAL(28,7); locally it compared equal, on the driver it hash-mismatched
0.3246000 vs 0.3246). Decimal objects keep their scale through str(), so the
same class of bug now fails here too. A DESCRIBE-based type-family check
additionally reports decimal-vs-double mismatches explicitly.
"""
import sys, json, glob, os, decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, decimal.Decimal):
        # deliberately NOT float-canonicalized: a decimal-typed engine column
        # must fail against a double oracle, exactly as the driver fails it
        return str(v)
    if isinstance(v, float):
        # driver-style canonicalization; engine queries already round
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)

def type_family(duck_type):
    t = duck_type.upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    return t

def run(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    trows = con.execute(f"DESCRIBE {sql}").fetchall()
    types = {r[0]: type_family(r[1]) for r in trows}
    return cols, rows, types

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    ccols = [cols[i] for i in order]
    crows = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return ccols, crows

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
            gc0, gr0, gt = run(con, f"SELECT * FROM read_parquet({spark_glob!r})")
            wc0, wr0, wt = run(con, sql)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gc, gr = canon(gc0, gr0)
        wc, wr = canon(wc0, wr0)
        type_mismatch = [
            c for c in gc if c in wt and
            {"decimal", "float"} == {gt.get(c), wt.get(c)}
        ]
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
        elif type_mismatch:
            detail = ", ".join(f"{c}: spark={gt[c]} oracle={wt[c]}"
                               for c in type_mismatch)
            print(f"FAIL {name}: decimal/double type mismatch ({detail})")
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
