"""Fixture-table loaders: explicit-schema parquet scans.

Every scan declares its StructType (no inference — SURVEY.md §1.3) so
Catalyst can prune columns and push filters into the parquet reader
without a footer-merge pass over 100 TB of files.

``events.ts`` has shipped under two physical encodings (parquet
TIMESTAMP(NANOS), which Spark 4 can only read as a nanos-long, and
native ``timestamp[us]``). Mixed-writer lakes make this kind of benign
physical drift the norm at 100 TB, so the loader probes ONE footer per
path (cached) and picks the read strategy from the evidence instead of
freezing an assumption into the schema.
"""

from __future__ import annotations

import functools
import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schemas
from ..session import apply_runtime_confs


@functools.lru_cache(maxsize=None)
def events_ts_is_integral(path: str) -> bool:
    """True iff Spark will surface the parquet ``ts`` column at
    ``path`` as a nanos-long: either a genuine integer column, or a
    parquet TIMESTAMP(NANOS) — which pyarrow reports as
    ``timestamp[ns]`` but Spark 4 can only read as a long under
    ``spark.sql.legacy.parquet.nanosAsLong``. False for encodings
    Spark reads natively as TimestampType (timestamp[us]/[ms]/int96).

    Reads a single parquet footer on the driver — O(KB) regardless of
    dataset size — and caches per path, so at 100 TB this is one
    metadata round-trip, not a scan.
    """
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    target = path
    if os.path.isdir(path):
        files = sorted(
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        if files:
            target = files[0]
    t = pq.ParquetFile(target).schema_arrow.field("ts").type
    return pat.is_integer(t) or (pat.is_timestamp(t) and t.unit == "ns")


def events_read_plan(path: str, spark: SparkSession | None = None):
    """Return ``(read_schema, needs_nanos_rebuild)`` for an events
    parquet at ``path``.

    Falls back to an unforced Spark schema probe (one footer read on
    the JVM side) when pyarrow can't open the path — e.g. a non-local
    filesystem URI that only the Hadoop connectors understand.
    """
    try:
        integral = events_ts_is_integral(path)
    except Exception:
        if spark is None:
            raise
        probed = spark.read.parquet(path).schema["ts"].dataType
        integral = isinstance(probed, (T.LongType, T.IntegerType))
    return (schemas.EVENTS_RAW, True) if integral else (schemas.EVENTS, False)


@functools.lru_cache(maxsize=None)
def _check_schema_drift(path: str, name: str) -> None:
    """Fail LOUDLY if a declared scan schema would silently misread
    the parquet's physical types — the r5 failure class: Spark forces
    a declared LongType onto a physical timestamp[us] column without
    complaint and the values come out 1000x off. One cached footer
    read per (path, table); only temporal-vs-non-temporal drift is an
    error (numeric widenings and string cases Spark handles soundly).
    """
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    declared = schemas.FIXTURES.get(name)
    if declared is None:
        return
    target = path
    if os.path.isdir(path):
        files = sorted(
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        if not files:
            return
        target = files[0]
    try:
        arrow = pq.ParquetFile(target).schema_arrow
    except Exception:
        return  # non-local FS — Spark's own reader will validate
    for field in declared.fields:
        if field.name not in arrow.names:
            continue
        phys = arrow.field(field.name).type
        phys_temporal = pat.is_timestamp(phys) or pat.is_date(phys)
        decl_temporal = isinstance(
            field.dataType, (T.TimestampType, T.TimestampNTZType, T.DateType)
        )
        # timestamp[ns] deliberately reads as long (events rebuild
        # path) — that pairing is the one sanctioned exception.
        if phys_temporal and getattr(phys, "unit", None) == "ns":
            continue
        if phys_temporal != decl_temporal:
            raise ValueError(
                f"schema drift in {target}: column {field.name!r} is "
                f"{phys} in the parquet footer but declared as "
                f"{field.dataType.simpleString()} — a forced read "
                f"would silently corrupt values; update schemas.py "
                f"or the loader's rebuild rules"
            )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table from ``{sf_dir}/{name}.parquet``.

    For ``events`` the physical type of ``ts`` is probed from the
    footer: nanos-as-long fixtures are rebuilt in the plan via
    ``timestamp_micros(ts div 1000)`` (integer arithmetic — a double
    division would lose precision above 2^53 ns); native micros
    fixtures are read directly as TimestampType.
    """
    apply_runtime_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        schema, rebuild = events_read_plan(path, spark)
        df = spark.read.schema(schema).parquet(path)
        if rebuild:
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    _check_schema_drift(path, name)
    schema = schemas.FIXTURES.get(name)
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql``."""
    for name in schemas.FIXTURES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
