#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare against the Verify parquet dumps
(schema, row count, values). Usage: crosscheck.py <sfDir> <verifyOutDir>"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name}: MISSING spark output"); fail += 1; continue
    spark_tbl = pq.read_table(files[0])
    try:
        duck = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {str(e)[:200]}"); fail += 1; continue
    s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck.column_names)
    if s_cols != d_cols:
        print(f"{name}: SCHEMA mismatch {s_cols} vs {d_cols}"); fail += 1; continue
    if spark_tbl.num_rows != duck.num_rows:
        print(f"{name}: ROWS {spark_tbl.num_rows} vs {duck.num_rows}"); fail += 1; continue
    srows = list(zip(*[spark_tbl.column(c).to_pylist() for c in s_cols]))
    drows = list(zip(*[duck.column(c).to_pylist() for c in d_cols]))
    bad = None
    for i, (a, b) in enumerate(zip(srows, drows)):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                if x != y and not (math.isnan(x) and math.isnan(y)):
                    bad = (i, a, b); break
            elif x != y:
                bad = (i, a, b); break
        if bad: break
    if bad:
        print(f"{name}: VALUE mismatch row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
        fail += 1
    else:
        print(f"{name}: OK ({spark_tbl.num_rows} rows)")
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
