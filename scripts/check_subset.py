"""Oracle-check a SUBSET of registry entries — drive_entry.py's exact
comparison discipline (row count + column set + order-insensitive
exact values vs DuckDB), scoped to the entries named on the command
line so an optimization's equivalence proof runs in seconds.

Usage: python scripts/check_subset.py <sf_dir> name [name ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
from pyspark_airflow_weather_etl_spark.plans import REGISTRY  # noqa: E402

SF_DIR = sys.argv[1]
NAMES = sys.argv[2:]
TABLES = (
    "region nation customer supplier part orders lineitem events"
    " documents embeddings".split()
)


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
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-subset")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{SF_DIR}/{t}.parquet')"
        )
    bad = 0
    for name in NAMES:
        ent = REGISTRY[name]
        t0 = time.time()
        got = ent.fn(spark, SF_DIR).toPandas()
        if ent.oracle is None:
            print(f"rows {name}: {len(got)} rows ({time.time()-t0:.1f}s)"
                  " [rows-only]")
            if len(got) == 0:
                bad += 1
            continue
        want = con.execute(ent.oracle).fetchdf()
        g, w = norm(got), norm(want)
        cols_ok = list(g.columns) == list(w.columns)
        n_bad = 0
        if cols_ok and len(g) == len(w):
            for c in g.columns:
                gv, wv = g[c].tolist(), w[c].tolist()
                n_bad += sum(
                    1 for x, y in zip(gv, wv) if not eq(x, y)
                )
        else:
            n_bad = -1
        ok = cols_ok and len(g) == len(w) and n_bad == 0
        bad += 0 if ok else 1
        print(
            f"{'OK  ' if ok else 'MISMATCH'} {name}: {len(g)} rows vs"
            f" {len(w)} cols={cols_ok} badcells={n_bad}"
            f" ({time.time()-t0:.1f}s)"
        )
    print("ALL OK" if bad == 0 else f"{bad} FAILURES")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
