#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
  - loads each <outDir>/<name> parquet (the Spark result)
  - runs <outDir>/oracle_sql.json's SQL in DuckDB over the same sfDir
  - compares: schema (sorted col names), row count, and values
    (rows sorted, floats rounded to 6dp)

Usage: python3 tools/check_correctness.py <sfDir> <outDir>
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # normalize lists to tuples for sorting
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        if "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def dtype_family(dt):
    k = dt.kind if hasattr(dt, "kind") else "O"
    return {"i": "int", "u": "int", "f": "float", "b": "bool",
            "M": "datetime", "O": "object"}.get(k, k)


def compare(name, spark_df, oracle_df):
    problems = []
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        return [f"schema mismatch: spark={sc} oracle={oc}"]
    # The driver's hash is dtype-sensitive: a DuckDB HUGEINT (sum of
    # BIGINT, or BIGINT // and %) becomes float64 in pandas while the
    # Spark parquet is int64 -- values equal, hash differs (the r6
    # q63/q65 failure). Catch the family mismatch here so it can never
    # reach the driver again.
    for c in sc:
        sf, of = dtype_family(spark_df[c].dtype), dtype_family(oracle_df[c].dtype)
        if sf != of:
            problems.append(
                f"dtype family mismatch on {c}: spark={spark_df[c].dtype} "
                f"oracle={oracle_df[c].dtype} (driver hash is dtype-sensitive; "
                f"CAST in the oracle SQL)")
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    a, b = canon(spark_df), canon(oracle_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
                av = pd.to_numeric(av, errors="coerce")
                bv = pd.to_numeric(bv, errors="coerce")
                bad = ~((av.isna() & bv.isna()) | (av == bv))
                if bad.any():
                    i = bad.idxmax()
                    problems.append(f"col {c}: {int(bad.sum())} diffs, e.g. row {i}: {av[i]!r} vs {bv[i]!r}")
            else:
                eq = (av.astype(str).where(~av.isna(), "<NA>") ==
                      bv.astype(str).where(~bv.isna(), "<NA>"))
                if not eq.all():
                    i = (~eq).idxmax()
                    problems.append(f"col {c}: {int((~eq).sum())} diffs, e.g. row {i}: {av[i]!r} vs {bv[i]!r}")
    return problems


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_df = pd.read_parquet(d)
        if name not in oracles:
            print(f"[SKIP] {name}: no oracle (rows={len(spark_df)})")
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_df, oracle_df)
        if problems:
            n_fail += 1
            print(f"[FAIL] {name}:")
            for p in problems:
                print(f"        {p}")
        else:
            n_pass += 1
            print(f"[PASS] {name} ({len(spark_df)} rows)")
    missing = set(oracles) - {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for m in sorted(missing):
        print(f"[FAIL] {m}: oracle declared but no spark result written")
        n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
