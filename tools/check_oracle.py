#!/usr/bin/env python3
"""Local mimic of the driver's t2 DuckDB-oracle gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers the sfDir parquet tables
as DuckDB views, runs each oracle SQL, and compares with the Spark
parquet output at <verifyOutDir>/<name>/ — columns sorted by name, rows
sorted, exact value compare (reports first diffs).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize listy cells to tuples so they sort/compare
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     getattr(v, "__len__", None) is not None and
                     not isinstance(v, (str, bytes))).any():
            try:
                df[c] = df[c].map(lambda v: tuple(v) if v is not None and
                                  not isinstance(v, (str, bytes, float, int)) else v)
            except Exception:
                pass
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="last").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # ScaleGen corpora are Spark-written DIRECTORIES; the driver
            # testdata are single files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        spark_path = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_path}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {spark_path}")
            n_bad += 1
            continue
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_bad += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        o, g = norm(oracle), norm(got)
        if list(o.columns) != list(g.columns):
            print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(g.columns)}")
            n_bad += 1
            continue
        if len(o) != len(g):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(g)}")
            n_bad += 1
            continue
        # dtype-kind mismatch (e.g. DuckDB HUGEINT -> float64 vs Spark
        # int64) hashes differently in the driver even when values
        # compare equal numerically — flag it.
        kind_bad = [(c, o[c].dtype, g[c].dtype) for c in o.columns
                    if o[c].dtype.kind != g[c].dtype.kind
                    and {o[c].dtype.kind, g[c].dtype.kind} <= {"i", "u", "f"}]
        if kind_bad:
            print(f"FAIL {name}: dtype kind mismatch {kind_bad}")
            n_bad += 1
            continue
        diff_cols = []
        for c in o.columns:
            a, b = o[c], g[c]
            try:
                same = (a.isna() & b.isna()) | (a == b)
            except Exception:
                same = a.astype(str) == b.astype(str)
            if not same.all():
                i = (~same).idxmax()
                diff_cols.append((c, i, a[i], b[i]))
        if diff_cols:
            print(f"FAIL {name}: value diffs {diff_cols[:3]}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(o)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
