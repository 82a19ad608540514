"""Drive the driver contract end-to-end, the way the verify/correctness
driver does: a plain SparkSession (none of the engine's session confs),
entry() smoke check, then every queries() entry at sf0.01 compared
against its oracle_sql() via DuckDB (row count + column set + order-
insensitive exact values).

Usage: python scripts/drive_entry.py [sf_dir]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
import __spark_entry__ as E  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


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
    # Deliberately vanilla: the driver's session, not the engine's.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("drive-entry")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = E.entry(spark).collect()
    print(f"entry(): {len(rows)} rows, first={rows[0] if rows else None}")
    assert len(rows) > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            got = norm(fn(spark, SF_DIR).toPandas())
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: raised {ex}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows ({dt:.1f}s) [rows-only]")
            continue
        want = norm(con.execute(oracles[name]).fetchdf())
        ok = list(got.columns) == list(want.columns) and len(got) == len(want)
        ncell = 0
        if ok:
            for c in got.columns:
                for x, y in zip(got[c].tolist(), want[c].tolist()):
                    if not eq(x, y):
                        ncell += 1
            ok = ncell == 0
        status = "OK   " if ok else "FAIL "
        if not ok:
            failures.append(name)
        print(
            f"{status}{name}: {len(got)} rows vs {len(want)} "
            f"cols={list(got.columns) == list(want.columns)} "
            f"badcells={ncell} ({dt:.1f}s)"
        )
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries OK at {SF_DIR}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
