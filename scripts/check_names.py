"""Oracle-check a subset of catalog entries at one or more SFs, with
the driver's vanilla session and compare rules — the fast inner loop
while building a new entry.

Usage: python scripts/check_names.py name1,name2 [sf_dir ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
import __spark_entry__ as E  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def eq(a, b):
    an = a is None or (isinstance(a, float) and math.isnan(a))
    bn = b is None or (isinstance(b, float) and math.isnan(b))
    if an or bn:
        return an == bn
    if isinstance(a, float) or isinstance(b, float):
        return float(a) == float(b)
    return a == b


def main() -> int:
    names = sys.argv[1].split(",")
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.01"]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-names")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = E.queries(), E.oracle_sql()
    rc = 0
    for sf in sf_dirs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')"
            )
        for name in names:
            t0 = time.time()
            got = norm(qs[name](spark, sf).toPandas())
            dt = time.time() - t0
            if name not in oracles:
                print(f"rows  {sf} {name}: {len(got)} rows ({dt:.1f}s)")
                continue
            want = norm(con.execute(oracles[name]).fetchdf())
            ok = list(got.columns) == list(want.columns) and len(got) == len(
                want
            )
            ncell = 0
            if ok:
                for c in got.columns:
                    for x, y in zip(got[c].tolist(), want[c].tolist()):
                        if not eq(x, y):
                            ncell += 1
                ok = ncell == 0
            if not ok:
                rc = 1
            print(
                f"{'OK   ' if ok else 'FAIL '}{sf} {name}: {len(got)} vs "
                f"{len(want)} cols="
                f"{list(got.columns) == list(want.columns)} "
                f"badcells={ncell} ({dt:.1f}s)"
            )
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
