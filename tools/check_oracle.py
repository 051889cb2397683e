#!/usr/bin/env python3
"""Local dev harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>

For each query dir under <verify_outdir>: load the Spark parquet result,
run the oracle SQL (oracle_sql.json) in DuckDB against the raw testdata
parquet tables, sort columns by name, sort rows, and compare values.
Dev-only tooling — NOT part of the Scala library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    # Driver parity: the driver row-sorts the RAW frame before hashing, and
    # pandas' lexsort factorizes each key — a raw ARRAY/STRUCT column raises
    # "unhashable type: 'numpy.ndarray'" THERE. Sorting before stringifying
    # reproduces that failure locally (stringify-first masked it and let
    # CORRECTNESS_r17's two x_materialize errors ship). Stringify only
    # afterwards, for the value compare.
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


def values_close(a, b) -> bool:
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # Byte-exact: the driver hashes serialized values with no tolerance,
        # so any float drift here is a real cross-engine failure.
        return a == b
    return a == b


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sfdir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(outdir) / "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for name in sorted(oracle):
        qdir = Path(outdir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            spark_df = canon(pd.read_parquet(qdir))
            duck_df = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_bad += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_bad += 1
            continue
        # Driver-parity dtype rule: the driver hashes *serialized* values, so
        # an integer column on one side and a float column on the other hash
        # differently even when every value compares equal in Python
        # (153 == 153.0). The classic trigger is DuckDB's sum(BIGINT) ->
        # HUGEINT, which pandas renders as float64 while Spark's BIGINT stays
        # int64 — fix the oracle with CAST(sum(...) AS BIGINT), never by
        # loosening this check (this exact drift was CORRECTNESS_r06's one
        # red row, x_budget_select).
        dtype_drift = None
        for c in spark_df.columns:
            sk, dk = spark_df[c].dtype.kind, duck_df[c].dtype.kind
            if {sk, dk} == {"i", "f"} or {sk, dk} == {"u", "f"}:
                dtype_drift = (c, spark_df[c].dtype, duck_df[c].dtype)
                break
        if dtype_drift:
            c, sd, dd = dtype_drift
            print(f"FAIL {name}: dtype drift col {c}: spark={sd} duck={dd} "
                  f"(int-vs-float serializes to different driver hashes; "
                  f"likely an un-CAST DuckDB aggregate -> HUGEINT)")
            n_bad += 1
            continue
        mismatch = None
        for c in spark_df.columns:
            sv, dv = spark_df[c].tolist(), duck_df[c].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if not values_close(a, b):
                    mismatch = (c, i, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} duck={b!r}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(spark_df)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
