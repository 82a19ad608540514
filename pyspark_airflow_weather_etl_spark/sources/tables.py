"""Fixture-table loaders: explicit-schema parquet scans.

Every scan declares its StructType (no inference — SURVEY.md §1.3) so
Catalyst can prune columns and push filters into the parquet reader
without a footer-merge pass over 100 TB of files.

``events.ts`` has shipped under two physical encodings (parquet
TIMESTAMP(NANOS), which Spark 4 can only read as a nanos-long, and
native ``timestamp[us]``). Mixed-writer lakes make this kind of benign
physical drift the norm at 100 TB, so the loader probes the part-file
footers under each path (metadata-only, cached per path) and picks the
read strategy from the evidence instead of freezing an assumption into
the schema; a directory whose files disagree refuses loudly rather
than letting one file's encoding silently misread the rest.
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


class MixedEncodingError(ValueError):
    """A directory's part-files disagree on a column's physical type,
    so no single read plan is sound — raised instead of misreading."""


def _parquet_files(path: str) -> list[str]:
    """All part-files under ``path`` (or ``[path]`` for a file)."""
    if os.path.isdir(path):
        return sorted(
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
    return [path]


@functools.lru_cache(maxsize=None)
def events_ts_is_integral(path: str) -> bool:
    """True iff Spark will surface the parquet ``ts`` column at
    ``path`` as a nanos-long: either a genuine integer column, or a
    parquet TIMESTAMP(NANOS) — which pyarrow reports as
    ``timestamp[ns]`` but Spark 4 can only read as a long under
    ``spark.sql.legacy.parquet.nanosAsLong``. False for encodings
    Spark reads natively as TimestampType (timestamp[us]/[ms]/int96).

    Probes EVERY part-file's footer, not just the first: the module's
    threat model is mixed-writer drift, and in a directory holding
    both nanos and micros files a first-file-only probe would force
    the minority encoding through the wrong read path — the exact r5
    silent 1000x corruption, directory-internal edition. A mixed dir
    therefore raises instead of misreading. Footer reads are O(KB)
    metadata each and the verdict is cached per path, so this is one
    bounded metadata sweep per process, never a data scan.
    """
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    verdicts: dict[bool, str] = {}
    for f in _parquet_files(path) or [path]:
        t = pq.ParquetFile(f).schema_arrow.field("ts").type
        integral = pat.is_integer(t) or (pat.is_timestamp(t) and t.unit == "ns")
        verdicts.setdefault(integral, f"{f} is {t}")
    if len(verdicts) > 1:
        raise MixedEncodingError(
            f"mixed ts encodings under {path}: {verdicts[True]} needs the "
            f"nanos-long rebuild but {verdicts[False]} reads natively as "
            f"TimestampType — one read plan would silently corrupt the "
            f"other half; rewrite the directory to a single encoding or "
            f"load the files separately"
        )
    return next(iter(verdicts))


#: Spark-fallback probe verdicts, keyed by path. The pyarrow path
#: caches via lru_cache; without this twin the non-local-FS fallback
#: would re-run a JVM file listing + footer read on EVERY load_table
#: call for the same path.
_SPARK_PROBE_CACHE: dict[str, bool] = {}


def events_read_plan(path: str, spark: SparkSession | None = None):
    """Return ``(read_schema, needs_nanos_rebuild)`` for an events
    parquet at ``path``.

    Falls back to an unforced Spark schema probe (one footer read on
    the JVM side, cached per path) when pyarrow can't open the path —
    e.g. a non-local filesystem URI that only the Hadoop connectors
    understand. A ``MixedEncodingError`` is NOT a probe failure and
    propagates: falling back would hand the mixed directory to
    Spark's first-footer schema pick, silently misreading half of it.
    """
    try:
        integral = events_ts_is_integral(path)
    except MixedEncodingError:
        raise
    except Exception:
        if spark is None:
            raise
        if path not in _SPARK_PROBE_CACHE:
            probed = spark.read.parquet(path).schema["ts"].dataType
            _SPARK_PROBE_CACHE[path] = isinstance(
                probed, (T.LongType, T.IntegerType)
            )
        integral = _SPARK_PROBE_CACHE[path]
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
    files = _parquet_files(path)
    if not files:
        return
    # Every part-file is checked (a homogeneous first file must not
    # vouch for a drifted sibling); footer reads are metadata-only
    # and the all-clear is cached per (path, table).
    for target in files:
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
            # path) — the ONE sanctioned pairing is ns -> integral.
            # ns under a declared temporal type is still drift: Spark
            # surfaces ns only as a long (nanosAsLong), so the forced
            # read dies later with an unactionable convert error —
            # raise the explanatory one here instead.
            if (
                phys_temporal
                and getattr(phys, "unit", None) == "ns"
                and not decl_temporal
            ):
                continue
            if phys_temporal != decl_temporal or (
                phys_temporal and getattr(phys, "unit", None) == "ns"
            ):
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
