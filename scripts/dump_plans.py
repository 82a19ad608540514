"""Dump ``explain('formatted')`` for every registry entry (or a named
subset) to a directory — the optimization round's plan-evidence
harness (guide §1: capture the plan shape before and after).

Usage: python scripts/dump_plans.py <out_dir> <suffix> [name ...]

Writes ``<out_dir>/<name>_<suffix>.txt`` per entry. Plans are built at
$SPARK_GRAFT_SF_DIR (default sf0.01 — plan SHAPE, not timing, is the
point; shapes are scale-invariant for these fixtures). Entries whose
callable executes work eagerly (index builds, streaming runs) still
produce the explain of their RESULT frame; the interesting at-rest
probe shapes come from the probe-side scan nodes."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_airflow_weather_etl_spark.plans import REGISTRY  # noqa: E402
from pyspark_airflow_weather_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or sorted(REGISTRY)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    failed = []
    for name in names:
        if name not in REGISTRY:
            print(f"?? unknown entry {name}", flush=True)
            failed.append(name)
            continue
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"ok {name}", flush=True)
        except Exception as e:  # noqa: BLE001 — survey harness
            print(f"ERR {name}: {type(e).__name__}: {e}", flush=True)
            failed.append(name)
    spark.stop()
    print(f"done: {len(names) - len(failed)}/{len(names)}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
