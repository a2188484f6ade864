#!/usr/bin/env python3
"""Determinism audit: value-exact comparison of two graft.Verify output
directories (e.g. produced under different SPARK_GRAFT_CPUS), after
canonical sorting — catches partition-order/partition-count
nondeterminism the DuckDB oracle compare can't (it normalizes), and
covers the rows-only queries the oracle skips entirely.

Usage: python3 tools/detdiff.py <outDirA> <outDirB>
"""
import glob
import os
import sys

import pandas as pd
import pyarrow.parquet as pq


def canon(path: str) -> pd.DataFrame:
    df = pq.read_table(path).to_pandas()
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def queries(d: str) -> set:
    # Verify writes each query as a parquet DIRECTORY named after the
    # query (no suffix), plus oracle_sql.json/_failures.json at top level
    return {os.path.basename(p) for p in glob.glob(f"{d}/*")
            if os.path.isdir(p)}


def main(a: str, b: str) -> int:
    names_a = queries(a)
    names_b = queries(b)
    if names_a != names_b:
        print(f"!! query sets differ: only-A={sorted(names_a - names_b)} "
              f"only-B={sorted(names_b - names_a)}")
        return 1
    bad = 0
    for name in sorted(names_a):
        da, db = canon(f"{a}/{name}"), canon(f"{b}/{name}")
        try:
            pd.testing.assert_frame_equal(da, db, check_exact=True)
            print(f"  [SAME] {name}: {len(da)} rows")
        except AssertionError as e:
            bad += 1
            print(f"  [DIFF] {name}: {str(e).splitlines()[0]}")
    print(f"identical={len(names_a) - bad} diff={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
