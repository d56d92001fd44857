#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Reads Verify output (<out>/<name>/ parquet + oracle_sql.json), runs each
oracle in DuckDB over the same sf dir, sorts columns by name + rows by all
columns, and compares values. Uses driver-side-only libs (duckdb/pandas) —
this file is tooling, not part of the graft library.
"""
import sys, os, glob, json
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps -> iso strings, floats -> repr
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.datetime64):
            # null timestamps render 'NaT'; object-column nulls render
            # 'None' — same SQL NULL, one spelling
            df[c] = df[c].astype("datetime64[us]").astype(str)
            df[c] = df[c].replace("NaT", "None")
        elif df[c].dtype == object:
            # SQL NULL surfaces as None from Spark parquet but NaN from
            # DuckDB .df() in object columns (e.g. nullable booleans);
            # both are the same NULL — normalize before str-compare.
            # The driver's clean corpus has no such nulls, so this
            # doesn't loosen the driver-gate stand-in.
            df[c] = df[c].where(pd.notna(df[c]), None).astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(outdir: str, sfdir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            # driver testdata ships single files; Spark-written dirs
            # (GenScale / GenAdversarial output) need the part-file glob
            pat = p if os.path.isfile(p) else f"{p}/*.parquet"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            mine = pd.concat([pd.read_parquet(f) for f in files])
            ref = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        a, b = norm(mine), norm(ref)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        eq = True
        for c in a.columns:
            # dtype KIND drift (e.g. DuckDB HUGEINT sum -> float/object while
            # Spark emits int64) hash-mismatches driver-side even when values
            # compare equal elementwise (str(7949.0) != str(7949)). Width-only
            # drift (int32 vs int64) is benign — same string form.
            ka, kb = a[c].dtype.kind, b[c].dtype.kind
            if ka != kb and {ka, kb} not in ({"i", "u"},):
                print(f"  WARN {name}.{c}: dtype {a[c].dtype} vs {b[c].dtype} (hash would MISMATCH)")
                eq = False
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
                ok = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
                exact = np.array_equal(av.astype(float), bv.astype(float), equal_nan=True)
                if ok and not exact:
                    print(f"  WARN {name}.{c}: equal only approximately (hash would MISMATCH)")
                    eq = False
                elif not ok:
                    bad = np.where(~np.isclose(av.astype(float), bv.astype(float), equal_nan=True))[0][:3]
                    print(f"  {name}.{c} diff at rows {bad}: {av[bad]} vs {bv[bad]}")
                    eq = False
            else:
                if not np.array_equal(av, bv):
                    bad = np.where(av != bv)[0][:3]
                    print(f"  {name}.{c} diff at rows {bad}: {av[bad]!r} vs {bv[bad]!r}")
                    eq = False
        if eq:
            print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout",
         sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01")
