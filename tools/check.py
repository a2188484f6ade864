#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run
  2. registers each parquet table from sfDir as a DuckDB view
  3. runs every oracle_sql.json query and compares against the Spark
     result parquet: schema (sorted column names), row count, and a
     value hash over rows sorted by all columns.

Dev-only tool (the driver has its own copy of this logic); not part of
the library.
"""
import json
import sys
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import glob
import os

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# The oracle SQL is authored and bit-verified against this DuckDB
# version. The one oracle that was burned by version-mobile list
# semantics (q103 soft-dedup) was restated in r8 via UNNEST+GROUP BY
# with a pure-BIGINT output; every remaining list-function site was
# audited (BENCH_NOTES r8 "oracle portability audit"): list_intersect
# only over pre-distincted inputs (count = set cardinality, stable),
# list_distinct/list_transform only in len()/pure-map positions. But
# quantile interpolation and ROUND internals can still move between
# releases — if the version differs, treat any hash mismatch as
# suspect-ENV before suspect-CODE.
PINNED_DUCKDB = "1.0.0"
if duckdb.__version__ != PINNED_DUCKDB:
    print("=" * 72)
    print(f"!! WARNING: DuckDB {duckdb.__version__} != pinned {PINNED_DUCKDB}.")
    print("!! Oracle results were bit-verified on the pinned version only;")
    print("!! a hash mismatch on this version may be engine skew, not a bug.")
    print("=" * 72)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types: ints -> int64, floats -> rounded float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    # queries that THREW in Verify leave an explicit record instead of
    # silently missing from the output dir (round-6 lesson)
    fail_file = f"{out_dir}/_failures.json"
    threw = json.load(open(fail_file)) if os.path.exists(fail_file) else {}
    for name, msg in threw.items():
        n_fail += 1
        print(f"  [FAIL-threw] {name}: {msg}")
    for name in sorted(os.listdir(out_dir)):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            continue
        files = glob.glob(f"{res_dir}/*.parquet")
        got = pq.ParquetDataset(files).read().to_pandas() if files else pd.DataFrame()
        if name not in oracle:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL-oracle-sql] {name}: {e}")
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            n_fail += 1
            print(f"  [FAIL-schema] {name}: spark={list(g.columns)} duck={list(w.columns)}")
            continue
        if len(g) != len(w):
            n_fail += 1
            print(f"  [FAIL-rows] {name}: spark={len(g)} duck={len(w)}")
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=False, rtol=1e-6, atol=1e-6)
            n_pass += 1
            print(f"  [PASS] {name}: {len(g)} rows")
        except AssertionError as e:
            n_fail += 1
            print(f"  [FAIL-values] {name}: {str(e).splitlines()[-1] if str(e) else e}")
    print(f"\npass={n_pass} fail={n_fail} rows_only={n_noracle}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
