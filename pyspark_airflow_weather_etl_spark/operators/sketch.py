"""Count-min sketch — a BOUNDED-SIZE frequency artifact (Cormode &
Muthukrishnan 2005) for heavy-hitter queries over unbounded key
domains (north-star surface; the reference at /root/reference has no
sketch operators).

Why an engine needs it at 100 TB: an exact frequency table is
vocabulary-sized — for token/n-gram/URL domains that is billions of
rows that must shuffle, store, and re-shuffle on every merge. The
count-min sketch is ``d x w`` integer counters REGARDLESS of the key
domain: the build's aggregation state collapses map-side to at most
``d*w`` groups (the shuffle after partial aggregation is sketch-sized,
not vocabulary-sized), the artifact broadcasts anywhere (a few KB),
and two sketches over disjoint batches ADD cell-wise into exactly the
sketch of the union — integer adds are exactly additive, so
incremental / streaming maintenance is BIT-IDENTICAL to a one-shot
build (the PCA moment-store argument applied to counts).

Estimates are ONE-SIDED: ``est(key) >= true(key)`` always (each of the
d rows only ever adds other keys' collisions), and
``est <= true + e*N/w`` with high probability. Hence the heavy-hitter
guarantee: every key with true count above the threshold IS reported
(no false negatives); collisions can only add false positives, which
an exact verify over the reported sliver removes when needed — the
same sketch-prunes/exact-verifies contract as operators.bloom.

Portability: bucket ``i`` of a key is md5-derived
(``int(md5(key||'#'||i)[:8 hex]) % w`` — the feature_hash_embed
idiom), all counts are integers, so ANY engine replays the sketch
bit-for-bit; the DuckDB oracles for the cms_* catalog entries do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _bucket(key: Column, i: int, w: int) -> Column:
    h = F.md5(F.concat(key, F.lit(f"#{int(i)}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(int(w))


def cms_build(
    df: DataFrame, key_col: str | Column, w: int, d: int = 4
) -> DataFrame:
    """Build the sketch over a key MULTISET (every row is one
    occurrence). Output is the sparse counter table
    ``(row_idx int, bucket long, cnt long)`` — at most ``d*w`` rows
    total, whatever the key domain. NULL keys are skipped."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    keys = df.select(key.alias("__k")).where(F.col("__k").isNotNull())
    cells = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_idx"),
                        _bucket(F.col("__k"), i, w).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("__c")
    ).select("__c.row_idx", "__c.bucket")
    return (
        cells.groupBy("row_idx", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_collect(cms_df: DataFrame, w: int, d: int = 4) -> list[list[int]]:
    """Densify into the broadcastable artifact: ``d`` lists of ``w``
    counters (absent cells are 0). Driver-bounded by the SKETCH size
    (e.g. 4x1024 longs = 32 KB), never by the key count."""
    rows = [[0] * w for _ in range(d)]
    for r in cms_df.collect():
        rows[int(r["row_idx"])][int(r["bucket"])] = int(r["cnt"])
    return rows


def cms_merge(a: list[list[int]], b: list[list[int]]) -> list[list[int]]:
    """Cell-wise sum — the sketch of the multiset UNION. Exact:
    integer adds commute and associate, so any batch/stream split
    merges to the bit-identical one-shot sketch."""
    assert len(a) == len(b) and all(len(x) == len(y) for x, y in zip(a, b))
    return [[x + y for x, y in zip(ra, rb)] for ra, rb in zip(a, b)]


def cms_save(
    spark: SparkSession, rows: list[list[int]], w: int, path: str
) -> None:
    """Persist as a tiny parquet artifact (sparse cells + params)."""
    d = len(rows)
    data = [
        (i, j, c, int(w), int(d))
        for i, row in enumerate(rows)
        for j, c in enumerate(row)
        if c != 0
    ] or [(0, 0, 0, int(w), int(d))]
    spark.createDataFrame(
        data, "row_idx long, bucket long, cnt long, w long, d long"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def cms_load(spark: SparkSession, path: str) -> tuple[list[list[int]], int]:
    df = spark.read.parquet(path)
    meta = df.select("w", "d").first()
    w, d = int(meta["w"]), int(meta["d"])
    rows = [[0] * w for _ in range(d)]
    for r in df.select("row_idx", "bucket", "cnt").collect():
        if r["cnt"]:
            rows[int(r["row_idx"])][int(r["bucket"])] = int(r["cnt"])
    return rows, w


def with_cms_estimate(
    df: DataFrame,
    rows: list[list[int]],
    key: str | Column,
    w: int,
    est_col: str = "est_count",
) -> DataFrame:
    """Append the count-min estimate ``min_i rows[i][bucket_i(key)]``
    — MAP-SIDE: the sketch rides one broadcast single-row frame of
    ``d`` arrays, the probe is ``d`` element_at lookups + least()
    inside the scan stage. NULL keys estimate NULL."""
    spark = df.sparkSession
    key_c = F.col(key) if isinstance(key, str) else key
    d = len(rows)
    schema = ", ".join(f"__cms{i} array<long>" for i in range(d))
    arr = spark.createDataFrame([tuple(rows)], schema)
    out = df.crossJoin(F.broadcast(arr))
    looks = [
        F.element_at(
            F.col(f"__cms{i}"), _bucket(key_c, i, w).cast("int") + F.lit(1)
        )
        for i in range(d)
    ]
    est = F.least(*looks) if d > 1 else looks[0]
    return out.withColumn(
        est_col,
        F.when(key_c.isNull(), F.lit(None).cast("long")).otherwise(
            est.cast("long")
        ),
    ).drop(*[f"__cms{i}" for i in range(d)])


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str | Column,
    w: int,
    d: int = 4,
    frac_denom: int = 64,
) -> DataFrame:
    """Keys whose SKETCH estimate is at least ``N/frac_denom`` of the
    total count — output ``(key, est_count)``. One-sided guarantee:
    every truly-heavy key is reported (est >= true); collisions may
    add lighter keys whose estimate crossed the line (bounded by the
    e*N/w error — verify exactly over this sliver when the
    application needs it). The threshold is an integer
    cross-multiplication (est * frac_denom >= N), no float boundary.

    The candidate enumeration is one distinct over the key column —
    the pass a heavy-hitter report needs anyway; the sketch's value
    is everything AROUND that pass: bounded build state, a
    broadcastable artifact, and exact additivity across batches
    (incremental maintenance without a vocabulary-sized state
    store)."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    keys = df.select(key.alias("key")).where(F.col("key").isNotNull())
    n_total = keys.count()
    rows = cms_collect(cms_build(df, key_col, w, d), w, d)
    est = with_cms_estimate(keys.distinct(), rows, "key", w, "est_count")
    return est.where(
        F.col("est_count") * F.lit(int(frac_denom)) >= F.lit(int(n_total))
    )


# ---------------------------------------------------------------------------
# Portable HyperLogLog (Flajolet et al. 2007) — the distinct-count
# counterpart of the count-min sketch above, built on the same
# portability discipline so the DuckDB oracle replays it bit-for-bit
# (the engine's built-in approx_count_distinct entry stays rows-only:
# its HLL++ sketch is engine-internal; THIS one is the
# cross-engine-checkable twin).
#
# Key -> 60-bit integer from the first 15 md5 hex chars; bucket = low
# 8 bits (m=256); rho = trailing zeros of the remaining 52 bits + 1
# (counted via bin()/rtrim string arithmetic — pure integer/string
# ops, no platform log2). Registers merge by MAX — idempotent,
# commutative, associative: duplicate keys, replayed batches, any
# arrival order all leave the registers unchanged, which is exactly
# why the sketch counts DISTINCT.
#
# The estimator keeps cross-engine float parity the way the engine's
# float contract prescribes: the harmonic sum is computed as the
# EXACT INTEGER  sum(2^(53 - rho))  (terms are powers of two <= 2^53,
# m=256 of them -> < 2^61, exact in BIGINT), and the only float
# arithmetic is one literal-constant multiply chain + one division +
# round(6) with an identical expression shape in both engines.
# ---------------------------------------------------------------------------

HLL_M = 256
#: 0.7213 / (1 + 1.079/256), pinned to the exact double literal used
#: in BOTH the Spark expression and the DuckDB oracle
HLL_ALPHA_LIT = "0.7182725932495458"
_HLL_MAX_RHO = 53  # 52 payload bits all zero -> rho 53


def hll_build(df: DataFrame, key_col: str | Column) -> DataFrame:
    """Registers over a key multiset: ``(bucket int, max_rho int)``
    — at most 256 rows; the aggregation collapses map-side to
    register count regardless of key cardinality. NULL keys skip."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    staged = df.where(key.isNotNull()).select(h.alias("__h")).select(
        (F.col("__h") % HLL_M).cast("int").alias("bucket"),
        F.expr(f"CAST(__h div {HLL_M} AS BIGINT)").alias("__w"),
    )
    rho = (
        F.when(F.col("__w") == 0, F.lit(_HLL_MAX_RHO))
        .otherwise(
            F.length(F.bin("__w"))
            - F.length(F.expr("rtrim('0', bin(__w))"))
            + F.lit(1)
        )
        .cast("int")
    )
    return (
        staged.select("bucket", rho.alias("__rho"))
        .groupBy("bucket")
        .agg(F.max("__rho").alias("max_rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Register-wise MAX — the sketch of the key-set UNION.
    Idempotent: overlapping or duplicated inputs cannot inflate the
    estimate (max(x, x) = x), the property that makes the sketch a
    DISTINCT counter and its store replay-proof."""
    return (
        a.unionByName(b)
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One output row ``(n_used_buckets, int_harmonic_sum, estimate)``
    from the register table: the raw HLL estimator, with
    linear-counting fallback below ``2.5 m`` when empty buckets
    remain (the published small-range correction; ln + round(6) is
    the engine's sanctioned one-float-op shape). ``int_harmonic_sum``
    is the exact integer ``sum(2^(53-rho))`` with every EMPTY bucket
    contributing ``2^53`` — the float estimate derives from it by one
    literal multiply chain + one division, identical in the DuckDB
    oracle."""
    agg = registers.agg(
        F.count(F.lit(1)).cast("long").alias("n_used_buckets"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_MAX_RHO} - max_rho)")
        )
        .cast("long")
        .alias("__used_sum"),
    )
    pow53 = 1 << _HLL_MAX_RHO
    return (
        agg.withColumn(
            "int_harmonic_sum",
            (
                F.col("__used_sum")
                + (F.lit(HLL_M) - F.col("n_used_buckets")) * F.lit(pow53)
            ).cast("long"),
        )
        .withColumn(
            "__raw",
            F.expr(
                f"CAST('{HLL_ALPHA_LIT}' AS DOUBLE)"
                f" * CAST({HLL_M} AS DOUBLE) * CAST({HLL_M} AS DOUBLE)"
                f" * CAST({1 << _HLL_MAX_RHO} AS DOUBLE)"
                f" / CAST(int_harmonic_sum AS DOUBLE)"
            ),
        )
        .withColumn(
            "estimate",
            F.round(
                F.when(
                    (F.col("__raw") <= F.lit(2.5 * HLL_M))
                    & (F.col("n_used_buckets") < F.lit(HLL_M)),
                    F.expr(
                        f"CAST({HLL_M} AS DOUBLE) * ln("
                        f"CAST({HLL_M} AS DOUBLE) / "
                        f"CAST({HLL_M} - n_used_buckets AS DOUBLE))"
                    ),
                ).otherwise(F.col("__raw")),
                6,
            ),
        )
        .select("n_used_buckets", "int_harmonic_sum", "estimate")
    )
