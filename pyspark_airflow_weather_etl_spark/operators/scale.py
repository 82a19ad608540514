"""Scale-hardening operators (SURVEY.md §7 Phase 5): data layout and
skew tools for the 100 TB deployment.

- ``write_bucketed``: hash-bucketed table layout so repeated fact-fact
  joins/aggregations on the bucket key run with ZERO exchange — the
  shuffle is paid once at write time, amortized over every query.
- ``salted_join``: explicit salting for a hot key that AQE's runtime
  skew splitting can't fix (e.g. one key that is 50% of the table —
  splitting the partition still leaves one straggler *task* per
  sub-split reading the same build side).
- ``two_phase_agg``: salt → partial agg → final agg for skewed
  group-bys of algebraic aggregates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    path: str,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist hash-bucketed (+ optionally sorted) — joins and aggs on
    the bucket key then need no exchange (and no sort, when sorted)."""
    w = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Equi-join where ``left`` has heavily skewed join keys: spread
    each left key over ``salts`` sub-keys (deterministic hash of the
    full row, so re-runs place rows identically) and replicate the
    right side to every salt. Right-side cost ×salts — use for
    dimension-sized right sides only.

    Only ``inner`` and ``left`` are supported: the right side is
    replicated ``salts`` times, so any join that emits unmatched
    right rows ('right'/'full') would duplicate them per salt, and
    semi/anti semantics silently change under replication.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "replicated right side duplicates unmatched right rows for "
            "right/full joins and breaks semi/anti semantics"
        )
    on = list(on)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salts)
    ).cast("int")
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return l_salted.join(r_salted, on + ["__salt"], how).drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    counts: bool = True,
    salts: int = 16,
) -> DataFrame:
    """Skew-proof grouped SUM/COUNT: group on (key, salt) first — the
    hot key's rows split across ``salts`` reducers — then combine the
    partials. (Spark's partial aggregation already does this map-side;
    explicit salting matters when the *reduce* side of one key
    overwhelms a task, e.g. low-cardinality keys with giant groups.)"""
    keys = list(keys)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.count("*").alias("__cnt"),
            *[F.sum(c).alias(f"__sum_{c}") for c in sums],
        )
    )
    aggs: list[Column] = []
    if counts:
        aggs.append(F.sum("__cnt").alias("n_rows"))
    aggs.extend(F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sums)
    return partial.groupBy(*keys).agg(*aggs)


def bucketed_tables_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> DataFrame:
    """Join two co-bucketed tables — with matching bucket specs the
    physical plan contains no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), list(on))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    files_per_write: int | None = None,
) -> None:
    """Z-order (Morton) layout: interleave the bits of min/max-scaled
    numeric columns into one sort key and range-partition + sort by
    it — every file then has a TIGHT min/max span on EVERY z-ordered
    column simultaneously, so range predicates on any of them (or
    any combination) skip files via footer stats. A single-column
    sort (``write_sorted``) gives perfect skipping on that column and
    none on the others; Z-order trades a bit of per-column tightness
    for multi-column skipping — the standard lakehouse layout for
    multi-dimension probe tables (e.g. (event_time, user_id)).

    Column scaling needs each column's min/max — ONE driver-side agg
    row over the input (the same bounded-collect class as IVF
    centroid training; at 100 TB this is a metadata-cheap pass Spark
    computes from partial aggs). Columns must be numeric or castable
    to double (timestamps cast to epoch seconds). The interleaved key
    is ``bits × len(cols)`` wide — keep ≤ 62 bits total.
    """
    if bits * len(cols) > 62:
        raise ValueError(
            f"z-key would need {bits * len(cols)} bits; keep bits*cols <= 62"
        )
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).first()
    top = (1 << bits) - 1
    scaled = []
    for i, c in enumerate(cols):
        mn, mx = stats[f"mn_{i}"], stats[f"mx_{i}"]
        span = (mx - mn) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                ((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top)
                .cast("long"),
            )
        )
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, v in enumerate(scaled):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(v, i).bitwiseAND(F.lit(1)),
                    i * len(scaled) + j,
                )
            )
    zdf = df.withColumn("__z", key)
    if files_per_write:
        zdf = zdf.repartitionByRange(int(files_per_write), "__z")
    else:
        zdf = zdf.repartitionByRange("__z")
    (
        zdf.sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    files_per_write: int | None = None,
) -> None:
    """Range-partition + sort-within-files layout: rows land in files
    whose min/max column statistics are tight, so a range predicate
    skips whole files (file-level pruning from the range layout) and
    whole row groups inside the touched files (parquet min/max
    stats). The query-side filter needs no hint — Spark's parquet
    reader consults the footer stats automatically; what the WRITE
    controls is whether those stats are selective. On unsorted data
    every file spans the full value range and nothing skips.

    This is the single cheapest 100 TB read optimization: one sort at
    write time buys every range query a data-proportional scan."""
    if files_per_write:
        w = df.repartitionByRange(int(files_per_write), *sort_cols)
    else:
        w = df.repartitionByRange(*sort_cols)
    (
        w.sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def _tree_bytes_and_files(spark: SparkSession, path: str) -> tuple[int, int]:
    """(total data bytes, data-file count) under ``path`` via the
    Hadoop FileSystem API — works for hdfs://, s3a://, local alike;
    _SUCCESS/_metadata markers and hidden files excluded."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    it = fs.listFiles(p, True)
    total, n = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        total += st.getLen()
        n += 1
    return total, n


def _partition_value_bytes(
    spark: SparkSession, path: str, partition_cols: Sequence[str]
) -> dict[tuple[str | None, ...], int]:
    """Data bytes per hive partition VALUE tuple under ``path``, from
    the same recursive listing ``_tree_bytes_and_files`` does — no
    data read. Directory segments ``col=value`` are hive-unescaped
    (%XX) and ``__HIVE_DEFAULT_PARTITION__`` maps to ``None``; files
    not under a full ``len(partition_cols)``-deep hive tree are
    ignored (they would not be read as that partition anyway)."""
    from urllib.parse import unquote

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    base = jvm.org.apache.hadoop.fs.Path(path)
    fs = base.getFileSystem(conf)
    base_uri = fs.makeQualified(base).toString().rstrip("/")
    it = fs.listFiles(base, True)
    out: dict[tuple[str | None, ...], int] = {}
    while it.hasNext():
        st = it.next()
        fp = st.getPath()
        if fp.getName().startswith(("_", ".")):
            continue
        rel = fp.toString()[len(base_uri) :].strip("/").split("/")[:-1]
        vals: list[str | None] = []
        for col, seg in zip(partition_cols, rel):
            if not seg.startswith(col + "="):
                break
            raw = seg[len(col) + 1 :]
            vals.append(
                None if raw == "__HIVE_DEFAULT_PARTITION__" else unquote(raw)
            )
        if len(vals) != len(partition_cols):
            continue
        key = tuple(vals)
        out[key] = out.get(key, 0) + st.getLen()
    return out


def compact_table(
    spark: SparkSession,
    path: str,
    partition_cols: Sequence[str] = (),
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_per_partition_col: int = 1,
) -> tuple[int, int]:
    """Small-file compaction — the table-maintenance pass every
    long-lived 100 TB dataset needs: streaming appends, per-batch
    dynamic-overwrite jobs, and incremental-index writes all accrete
    tiny files, and each one costs an open + a footer parse + a
    listing entry on every subsequent scan (NameNode/object-store
    pressure grows linearly with file count, not bytes).

    Strategy: size the rewrite from the TREE ITSELF —
    ``n = ceil(bytes / target_file_bytes)`` output slots — then
    rewrite in one job:

    both layouts go through the crash-safe aside swap
    (:func:`..sources.writers.overwrite_parquet_swap` — the rewrite
    READS its own target, so a plain overwrite would delete the input
    mid-job; the swap keeps a complete copy live at every crash
    point). Flat tables: ``repartition(n)``. Hive-partitioned tables:
    ``repartition(Σ slots, partition_cols + salt)`` where each
    partition VALUE gets ``slots = ceil(its bytes / target)`` output
    slots, sized from the listing's per-directory byte totals (no
    data read) and attached via a broadcast join on the hive-decoded
    value strings. Small partitions keep one slot → one file; a
    multi-GB partition (a hot date/shard) splits into target-sized
    files instead of one serial giant — still one shuffle, and the
    per-value salt bound means a small partition never scatters into
    per-slot fragments the way a uniform salt would.

    Returns (files_before, files_after). Compaction changes LAYOUT
    only — row-level content is asserted identical in
    tests/test_scale.py, and parquet min/max stats regenerate on the
    rewritten files."""
    import math

    from ..sources.writers import overwrite_parquet_swap

    total, before = _tree_bytes_and_files(spark, path)
    n = max(min_files_per_partition_col, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if partition_cols:
        pv_bytes = _partition_value_bytes(spark, path, partition_cols)
        slot_rows = [
            (*vals, math.ceil(b / target_file_bytes) or 1)
            for vals, b in pv_bytes.items()
        ]
        pv_cols = [f"__pv_{c}" for c in partition_cols]
        slots_df = spark.createDataFrame(
            slot_rows or [tuple([None] * len(pv_cols)) + (1,)],
            schema=", ".join(f"`{c}` string" for c in pv_cols)
            + ", __slots int",
        )
        cond = None
        for c, pv in zip(partition_cols, pv_cols):
            eq = F.col(c).cast("string").eqNullSafe(F.col(pv))
            cond = eq if cond is None else cond & eq
        salted = df.join(F.broadcast(slots_df), cond, "left").withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in df.columns]),
                F.coalesce(F.col("__slots"), F.lit(1)),
            ).cast("int"),
        )
        n_slots = max(n, sum(r[-1] for r in slot_rows) or 1)
        compacted = salted.repartition(
            n_slots, *[F.col(c) for c in partition_cols], F.col("__salt")
        ).drop("__salt", "__slots", *pv_cols)
        overwrite_parquet_swap(compacted, path, partition_by=partition_cols)
    else:
        overwrite_parquet_swap(df.repartition(n), path)
    _, after = _tree_bytes_and_files(spark, path)
    return before, after


def zorder_value(
    col_a: Column | str, col_b: Column | str, bits: int = 16
) -> Column:
    """Morton/Z-order curve value of two pre-binned integer columns
    (each already in [0, 2^bits)): bit j of each input lands at output
    bits 2j / 2j+1. Pure JVM bitwise expression — ``bits`` shift-and-
    or terms per column, whole-stage-codegen friendly, no UDF."""
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    a = a.cast("bigint")
    b = b.cast("bigint")
    z = F.lit(0).cast("bigint")
    for j in range(bits):
        z = (
            z.bitwiseOR(
                F.shiftleft(F.shiftright(a, j).bitwiseAND(F.lit(1)), 2 * j)
            ).bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, j).bitwiseAND(F.lit(1)), 2 * j + 1
                )
            )
        )
    return z


def write_zorder(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    files_per_write: int | None = None,
) -> None:
    """Two-dimensional locality layout: rows sort along the Z-order
    (Morton) curve of two columns, so files carry TIGHT min/max
    statistics on BOTH — a predicate on either column (or a 2-D box)
    skips files, where a linear sort serves only its leading column
    and reads everything for the other (measured: bench.py
    _zorder_comparison). This is Delta/Iceberg's OPTIMIZE ZORDER
    expressed as plain Spark: bin each column to ``bits`` by its own
    min/max (one tiny setup aggregate; the float binning affects
    LAYOUT only, never values), interleave bits JVM-side, range-
    partition + sort by the curve position. One write-time sort buys
    every 2-D-selective query a data-proportional scan at 100 TB."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    span = (1 << bits) - 1

    def _bin(c: str, lo, hi) -> Column:
        if hi == lo:
            return F.lit(0).cast("bigint")
        return F.least(
            F.lit(span).cast("bigint"),
            F.floor(
                (F.col(c).cast("double") - F.lit(float(lo)))
                * F.lit(float(span))
                / F.lit(float(hi - lo))
            ).cast("bigint"),
        )

    z = zorder_value(_bin(col_a, lo_a, hi_a), _bin(col_b, lo_b, hi_b), bits)
    zdf = df.withColumn("__z", z)
    if files_per_write:
        w = zdf.repartitionByRange(int(files_per_write), "__z")
    else:
        w = zdf.repartitionByRange("__z")
    (
        w.sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
