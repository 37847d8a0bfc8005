#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/local_check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet (written by graft.Verify), runs the matching
SQL from <out>/oracle_sql.json in DuckDB over views named after the testdata
tables, sorts columns by name and rows by all columns, and diffs values.
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp = con.sql(sql).df()
            g, e = normalize(got), normalize(exp)
            if list(g.columns) != list(e.columns):
                print(f"FAIL {name}: columns differ spark={list(g.columns)} duck={list(e.columns)}")
                n_fail += 1
                continue
            # The driver hashes dtype-sensitive reprs: int64 123 vs float64 123.0
            # hash-differ even though == compares equal (e.g. DuckDB HUGEINT sums
            # widen to float64 in pandas). Mirror that strictness here.
            dt = [c for c in g.columns if g[c].dtype != e[c].dtype]
            if dt:
                print(f"FAIL {name}: dtypes differ " + ", ".join(
                    f"{c}: spark={g[c].dtype} duck={e[c].dtype}" for c in dt))
                n_fail += 1
                continue
            if len(g) != len(e):
                print(f"FAIL {name}: rows spark={len(g)} duck={len(e)}")
                n_fail += 1
                continue
            diffs = []
            for c in g.columns:
                gv, ev = g[c], e[c]
                if pd.api.types.is_float_dtype(gv):
                    neq = ~((gv == ev) | (gv.isna() & ev.isna()))
                else:
                    neq = ~((gv.astype(object) == ev.astype(object)) | (gv.isna() & ev.isna()))
                if neq.any():
                    i = int(neq.idxmax())
                    diffs.append(f"{c}[{i}]: spark={gv[i]!r} duck={ev[i]!r} ({int(neq.sum())} diffs)")
            if diffs:
                print(f"FAIL {name}: " + "; ".join(diffs[:3]))
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
        except Exception as ex:
            print(f"ERROR {name}: {type(ex).__name__}: {ex}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
