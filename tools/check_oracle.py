#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with views
over <sfDir>/*.parquet, loads the Spark result parquet from
<verifyOutDir>/<name>/, and compares (schema column names sorted, values
compared after sorting rows). Exit code 1 if any query mismatches.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output"); n_bad += 1; continue
        try:
            spark_df = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            duck_df = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); n_bad += 1; continue
        ok = True; why = ""
        if list(spark_df.columns) != list(duck_df.columns):
            ok, why = False, f"cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}"
        elif len(spark_df) != len(duck_df):
            ok, why = False, f"rows spark={len(spark_df)} duck={len(duck_df)}"
        else:
            s = spark_df.sort_values(list(spark_df.columns)).reset_index(drop=True)
            dd = duck_df.sort_values(list(duck_df.columns)).reset_index(drop=True)
            for c in s.columns:
                a, b = s[c], dd[c]
                if pd.api.types.is_float_dtype(a):
                    eq = (a.isna() & b.isna()) | (a == b)
                else:
                    eq = (a.isna() & b.isna()) | (a.astype(str) == b.astype(str))
                if not eq.all():
                    i = int(np.argmin(eq.values))
                    ok, why = False, f"col {c} row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r}"
                    break
        if ok:
            print(f"[ OK ] {name} ({len(spark_df)} rows)"); n_ok += 1
        else:
            print(f"[FAIL] {name}: {why}"); n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
