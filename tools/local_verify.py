#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF, then execute each oracle SQL in DuckDB over the same parquet
tables and compare (columns sorted by name, rows sorted, values compared
with exact equality; floats with tiny tolerance reported separately)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))])
    if name not in oracle:
        results[name] = f"ROWS_ONLY rows={len(spark_df)}" + (" OK" if len(spark_df) > 0 else " EMPTY!")
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR: {e}"
        continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    k = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(k.columns):
        results[name] = f"SCHEMA_MISMATCH spark={list(s.columns)} duck={list(k.columns)}"
        continue
    if len(s) != len(k):
        results[name] = f"ROWCOUNT_MISMATCH spark={len(s)} duck={len(k)}"
        continue
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    k = k.sort_values(by=list(k.columns)).reset_index(drop=True)
    def is_dateish(col):
        if str(col.dtype).startswith("datetime"):
            return True
        if col.dtype == object and len(col) > 0:
            import datetime
            v = col.dropna()
            return len(v) > 0 and isinstance(v.iloc[0], (datetime.date, datetime.datetime))
        return False
    for c in s.columns:
        if is_dateish(s[c]) or is_dateish(k[c]):
            try:
                s[c] = pd.to_datetime(s[c]).astype("datetime64[us]")
                k[c] = pd.to_datetime(k[c]).astype("datetime64[us]")
            except Exception:
                s[c] = s[c].apply(lambda v: None if pd.isna(v) else str(v)[:10])
                k[c] = k[c].apply(lambda v: None if pd.isna(v) else str(v)[:10])
        elif s[c].dtype == object and pd.api.types.is_numeric_dtype(k[c]):
            # Spark-side object column (e.g. Decimal(38,0)) vs DuckDB-side
            # numeric (e.g. DECIMAL(38,0) -> float64): Python equality says
            # Decimal("5") == 5.0, but the driver hash stringifies ("5" vs
            # "5.0") and desyncs — the r11 q148 regression. Never mask it.
            results[name] = (f"OBJECT_NUMERIC_DTYPE_MISMATCH (driver hash will "
                             f"fail): {c} spark={s[c].dtype} duck={k[c].dtype}")
            break
        elif k[c].dtype == object and pd.api.types.is_numeric_dtype(s[c]):
            results[name] = (f"OBJECT_NUMERIC_DTYPE_MISMATCH (driver hash will "
                             f"fail): {c} spark={s[c].dtype} duck={k[c].dtype}")
            break
        elif s[c].dtype == object and k[c].dtype != object:
            k[c] = k[c].astype(object)
    if name in results:
        continue
    # The driver's hash stringifies values, so an int64-vs-float64 column
    # (e.g. DuckDB HUGEINT sum -> pandas float64) hash-mismatches even when
    # numerically equal ("5" vs "5.0"). Flag it as a hard problem.
    dtype_bad = [c for c in s.columns
                 if (pd.api.types.is_integer_dtype(s[c]) and pd.api.types.is_float_dtype(k[c]))
                 or (pd.api.types.is_float_dtype(s[c]) and pd.api.types.is_integer_dtype(k[c]))]
    if dtype_bad:
        results[name] = ("INT_FLOAT_DTYPE_MISMATCH (driver hash will fail): "
                         + ", ".join(f"{c} spark={s[c].dtype} duck={k[c].dtype}" for c in dtype_bad))
        continue
    try:
        pd.testing.assert_frame_equal(s, k, check_dtype=False, check_exact=True)
        results[name] = f"MATCH rows={len(s)}"
    except AssertionError as e:
        try:
            pd.testing.assert_frame_equal(s, k, check_dtype=False, rtol=1e-9, atol=1e-9)
            results[name] = f"FLOAT_ONLY_DIFF rows={len(s)} (exact hash may fail)"
        except AssertionError:
            results[name] = "VALUE_MISMATCH: " + str(e).split("\n")[0][:200]
            diff = (s != k) & ~(s.isna() & k.isna())
            bad = diff.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                results[name] += f" | first diff row {i}: spark={s.loc[i].to_dict()} duck={k.loc[i].to_dict()}"
for n in sorted(results):
    print(f"{n:24s} {results[n]}")
bad = sum(1 for v in results.values() if not v.startswith(("MATCH", "ROWS_ONLY rows")) or "EMPTY" in v)
print(f"\n{len(results)} queries, {bad} problems")
