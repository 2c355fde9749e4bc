#!/usr/bin/env python3
"""DEV TOOL (not part of the library): local replica of the driver's
correctness gate. Runs each oracle SQL in DuckDB over the sf tables and
compares against the Spark parquet dumps written by graft.Verify
(columns sorted by name, rows sorted, values stringified).

Usage: python3 tools/oracle_check.py <sf-dir> <verify-out-dir>
Uses the driver-side python environment (duckdb/pyarrow)."""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    # numeric dtype kinds travel with the schema: an int64 column on
    # one side and float64 on the other (e.g. DuckDB sum(BIGINT) ->
    # HUGEINT -> pandas float64) must FAIL here, because the driver
    # hashes the stringified values and '123' != '123.0'. Non-numeric
    # kinds are ignored (dates arrive as 'O' from parquet but 'M'
    # from DuckDB yet stringify compatibly in the driver).
    kinds = [f"{c}:{df[c].dtype.kind}" for c in cols
             if df[c].dtype.kind in "iuf"]
    rows = []
    for r in df.itertuples(index=False):
        vals = []
        for v in r:
            if isinstance(v, float):
                # full precision, like the driver. This is safe ONLY
                # because every float-producing query routes through
                # the shared floor-rounding pattern (rnd()) on BOTH
                # engines, making the doubles bit-identical; a query
                # emitting an unrounded float aggregate would fail
                # spuriously here from summation-order ulps — round it
                # in the query instead of weakening this compare.
                vals.append(repr(v))
            else:
                vals.append(str(v))
        rows.append("|".join(vals))
    return cols, kinds, sorted(rows)

fail = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fail += 1; continue
    spark_df = pq.read_table(files[0]).to_pandas()
    if name not in oracle:
        print(f"{name}: rows-only check -> {len(spark_df)} rows " + ("OK" if len(spark_df) else "EMPTY!"))
        if not len(spark_df): fail += 1
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fail += 1; continue
    sc, sk, sr = canon(spark_df)
    dc, dk, dr = canon(duck_df)
    if sc != dc:
        print(f"{name}: SCHEMA MISMATCH spark={sc} duck={dc}"); fail += 1; continue
    if sk != dk:
        print(f"{name}: DTYPE MISMATCH spark={sk} duck={dk}"); fail += 1; continue
    if len(sr) != len(dr):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(sr)} duck={len(dr)}"); fail += 1; continue
    bad = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
    if bad:
        i = bad[0]
        print(f"{name}: VALUE MISMATCH at sorted row {i} ({len(bad)} rows differ)\n  spark: {sr[i]}\n  duck : {dr[i]}")
        fail += 1
    else:
        print(f"{name}: MATCH ({len(sr)} rows)")
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
