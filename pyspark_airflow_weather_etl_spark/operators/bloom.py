"""Portable Bloom-filter membership — broadcast pre-filtering for
dedup / decontamination at 100 TB (north-star surface; the reference
at /root/reference has no membership operators — its 3 linear jobs,
dags/weather_daily_etl.py, never join corpora).

The scale problem this solves: membership checks against a LARGE
at-rest key set (a benchmark suite's n-gram digests, a historical
fingerprint index) normally shuffle the entire probe corpus into a
join — at 100 TB that exchange IS the job. A Bloom filter compresses
the key set ~1000x (16 bits/key for ~0.2 % false positives at k=4),
small enough to BROADCAST at almost any index size, so the corpus is
filtered MAP-SIDE in the scan stage; only the bloom-positive sliver
(true hits + false positives) ever reaches the exact-verify join.
False positives are removed by that exact verify, so the final result
is bit-identical to the plain join — the sketch changes the plan, not
the answer (pinned by oracle + pytest equality).

Portability contract (the feature_hash_embed / minhash_lsh_portable
discipline): every bit position derives from md5 — for hash function
``i`` of key ``s``, position = ``int(md5(s || '#' || i)[:8 hex], 16)
% m_bits`` — and the filter packs into 32-bit words stored as longs
(shifting into bit 63 of a 64-bit word is engine-dependent on
signedness; bit 31 of an unsigned-fitting 32-bit word is not). Any
engine with md5 reproduces the EXACT filter: the DuckDB oracle for
``bloom_membership_documents`` replays build + probe bit-for-bit,
false positives included.

All arithmetic is integer; aggregation is ``bit_or`` (commutative,
associative — partition-order independent). No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: bits per 32-bit word (longs carry them; bit 31 max keeps every
#: word non-negative and shift semantics engine-portable)
WORD_BITS = 32


def sized_m_bits(n_keys: int, bits_per_key: int = 16) -> int:
    """Filter size for ``n_keys`` at ``bits_per_key`` density, rounded
    up to a whole word. 16 bits/key with k=4 probes gives ~0.2 %
    false positives ((1 - e^(-4/16))^4); the same formula must be used
    by any oracle replay: ``((bits_per_key*n + 31) // 32) * 32``."""
    n = max(int(n_keys), 1)
    return ((bits_per_key * n + WORD_BITS - 1) // WORD_BITS) * WORD_BITS


def _shl1(bits: Column) -> Column:
    """``1L << bits`` with a COLUMN shift amount (``F.shiftleft``
    only takes a literal int)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), bits)


def _bit_position(key: Column, i: int, m_bits: int) -> Column:
    """Portable bit position for hash function ``i``: the first 8 hex
    chars of md5(key || '#' || i) as an integer, mod m_bits. Always
    non-negative (8 hex chars < 2^32 fits a positive BIGINT)."""
    h = F.md5(F.concat(key, F.lit(f"#{int(i)}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(int(m_bits))


def bloom_build(
    df: DataFrame,
    key_col: str | Column,
    m_bits: int,
    k: int = 4,
) -> DataFrame:
    """Build the filter over a key column: k bit positions per key,
    packed into 32-bit words. Output is the SPARSE word table
    ``(word_idx long, word long)`` — only set words appear; absent
    word_idx means 0. The aggregation has at most ``m_bits/32``
    groups regardless of key count, so the shuffle after map-side
    partial ``bit_or`` is filter-sized, not corpus-sized."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    keys = df.select(key.alias("__k")).where(F.col("__k").isNotNull())
    pos = keys.select(
        F.explode(
            F.array(*[_bit_position(F.col("__k"), i, m_bits) for i in range(k)])
        ).alias("__pos")
    )
    return (
        pos.select(
            (F.col("__pos") / WORD_BITS).cast("long").alias("word_idx"),
            _shl1((F.col("__pos") % WORD_BITS).cast("int")).alias("__m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__m").alias("word"))
    )


def bloom_collect(bloom_df: DataFrame, m_bits: int) -> list[int]:
    """Densify the sparse word table into the broadcastable artifact:
    a Python list of ``m_bits/32`` longs (absent words are 0). The
    collect is bounded by the FILTER size (e.g. 2^20 bits = 32K
    longs = 256 KB), never by the key count — the same driver-side
    artifact shape as trained centroids / classifier weights."""
    n_words = m_bits // WORD_BITS
    words = [0] * n_words
    for r in bloom_df.collect():
        words[int(r["word_idx"])] = int(r["word"])
    return words


def bloom_save(
    spark: SparkSession, words: list[int], m_bits: int, k: int, path: str
) -> None:
    """Persist the filter as a tiny parquet artifact (sparse rows +
    the (m_bits, k) parameters on every row, so a reader needs no
    sidecar)."""
    rows = [
        (i, w, int(m_bits), int(k)) for i, w in enumerate(words) if w != 0
    ]
    spark.createDataFrame(
        rows or [(0, 0, int(m_bits), int(k))],
        "word_idx long, word long, m_bits long, k long",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def bloom_load(spark: SparkSession, path: str) -> tuple[list[int], int, int]:
    """Load a saved filter: returns (words, m_bits, k)."""
    df = spark.read.parquet(path)
    meta = df.select("m_bits", "k").first()
    m_bits, k = int(meta["m_bits"]), int(meta["k"])
    words = [0] * (m_bits // WORD_BITS)
    for r in df.select("word_idx", "word").collect():
        words[int(r["word_idx"])] = int(r["word"])
    return words, m_bits, k


def with_bloom_flag(
    df: DataFrame,
    words: list[int],
    key: str | Column,
    m_bits: int,
    k: int = 4,
    flag_col: str = "maybe_member",
) -> DataFrame:
    """Append a boolean ``flag_col``: True iff every one of the key's
    k filter bits is set (definitely-absent keys are False — the
    Bloom guarantee has no false negatives). Pure MAP-SIDE codegen:
    the filter rides one broadcast single-row array (the engine's
    broadcast-scalar pattern — a 32K-element literal would bloat the
    plan tree instead), and the probe is k element_at/bit-and checks
    inside the scan stage. NULL keys flag False explicitly (the
    engine's ANSI element_at null-propagation anomaly — a null index
    must never reach element_at)."""
    spark = df.sparkSession
    key_c = F.col(key) if isinstance(key, str) else key
    arr = spark.createDataFrame([(words,)], "__bloom array<long>")
    out = df.crossJoin(F.broadcast(arr))
    checks = []
    for i in range(k):
        pos = _bit_position(key_c, i, m_bits)
        word = F.element_at(
            F.col("__bloom"), (pos / WORD_BITS).cast("int") + F.lit(1)
        )
        mask = _shl1((pos % WORD_BITS).cast("int"))
        checks.append(word.bitwiseAND(mask) != F.lit(0))
    flag = checks[0]
    for c in checks[1:]:
        flag = flag & c
    return out.withColumn(
        flag_col, F.when(key_c.isNull(), F.lit(False)).otherwise(flag)
    ).drop("__bloom")


def ngram_counts_against_filter(
    df: DataFrame,
    words: list[int],
    m_bits: int,
    k: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Probe side only: per document, count distinct ``n``-gram
    digests the GIVEN filter flags maybe-present (false positives
    included). Output ``(id_col, n_grams, n_maybe)``. Used by both
    the inline build (:func:`ngram_bloom_counts`) and the streaming
    store cut (streaming.bloom_stream)."""
    from .dedup import spread_small_scan
    from .governance import ngram_phrases

    # a fixture-sized pool reads as ONE parquet split and the gram
    # explode + 1+k md5s per gram below are shuffle-free codegen —
    # left unspread they run on a single core (round 16; guarded
    # no-op on many-split deployments; measured 9.1 s → parallel)
    df = spread_small_scan(df)
    grams = df.select(
        F.col(id_col), F.explode(ngram_phrases(text_col, n)).alias("__g")
    ).select(id_col, F.md5("__g").alias("__fp"))
    flagged = with_bloom_flag(grams, words, "__fp", m_bits, k, "__maybe")
    return (
        df.select(id_col)
        .join(
            flagged.groupBy(id_col).agg(
                F.count(F.lit(1)).cast("long").alias("n_grams"),
                F.sum(F.col("__maybe").cast("long"))
                .cast("long")
                .alias("n_maybe"),
            ),
            id_col,
            "left",
        )
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_maybe", F.lit(0)).cast("long").alias("n_maybe"),
        )
    )


def ngram_bloom_counts(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 5,
    bits_per_key: int = 16,
    k: int = 4,
) -> DataFrame:
    """The raw SKETCH verdicts, exposed for the oracle: per pool
    document, how many of its distinct ``n``-gram digests the Bloom
    filter built over the benchmark's gram digests flags as
    maybe-present — FALSE POSITIVES INCLUDED. Output
    ``(id_col, n_grams, n_maybe)``. This is the entry whose DuckDB
    oracle replays the filter build and probe bit-for-bit (the
    portability contract made checkable); the false-positive count is
    ``n_maybe - true hits`` and is bounded in tests/test_bloom.py."""
    from .governance import ngram_phrases

    bench_fps = (
        benchmark.select(F.explode(ngram_phrases(bench_text_col, n)).alias("__g"))
        .select(F.md5("__g").alias("__fp"))
        .distinct()
    )
    n_keys = bench_fps.count()
    m_bits = sized_m_bits(n_keys, bits_per_key)
    words = bloom_collect(bloom_build(bench_fps, "__fp", m_bits, k), m_bits)
    return ngram_counts_against_filter(
        df, words, m_bits, k, id_col, text_col, n
    )


def decontaminate_bloom(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 5,
    bits_per_key: int = 16,
    k: int = 4,
) -> DataFrame:
    """ANY-HIT n-gram decontamination with a Bloom pre-filter — the
    100 TB form of :func:`..governance.decontaminate_against`'s
    membership core: a pool document is dropped when ANY of its
    distinct token ``n``-grams appears in the benchmark suite
    (stricter than the fractional rule — the right default when the
    benchmark is a held-out eval set and even one shared phrase is
    leakage).

    Plan shape, and why it survives 100 TB: the benchmark's distinct
    gram digests build a ~16-bits/key Bloom filter (one filter-sized
    aggregation); the POOL's grams are flagged map-side against the
    broadcast filter — the corpus-sized gram table never joins
    anything — and only bloom-positive grams (true hits + ~0.2 %
    false positives) reach the exact semi-join that removes false
    positives. Per-doc verified-hit counts take one narrow id
    exchange. The final result is bit-identical to the plain exact
    join (the oracle is sketch-free SQL); the sketch only removes
    ~99.8 % of the join's probe input.

    Output: KEPT rows ``(id_col, n_grams, n_hits)`` where
    ``n_hits = 0`` by construction — the audit columns prove the
    count pipeline ran (and match the oracle's replay).
    """
    from .dedup import spread_small_scan
    from .governance import ngram_phrases

    # single-split pool guard — see ngram_counts_against_filter
    df = spread_small_scan(df)
    bench_fps = (
        benchmark.select(F.explode(ngram_phrases(bench_text_col, n)).alias("__g"))
        .select(F.md5("__g").alias("__fp"))
        .distinct()
    )
    n_keys = bench_fps.count()  # one-time, index-build-sized action
    m_bits = sized_m_bits(n_keys, bits_per_key)
    words = bloom_collect(bloom_build(bench_fps, "__fp", m_bits, k), m_bits)

    # gram digests are consumed twice (flag/verify branch + per-doc
    # count); a persist_into of the gram frame was probed round 16
    # and REVERTED — cache materialization cost more than recomputing
    # the (now spread) explode+md5 kernel (5.8 s → 8.6 s at sf0.1)
    grams = df.select(
        F.col(id_col), F.explode(ngram_phrases(text_col, n)).alias("__g")
    ).select(id_col, F.md5("__g").alias("__fp"))
    flagged = with_bloom_flag(grams, words, "__fp", m_bits, k, "__maybe")
    # exact verify of the bloom-positive sliver only; semi join keeps
    # grams that are REALLY in the benchmark
    verified = (
        flagged.where(F.col("__maybe"))
        .join(bench_fps, "__fp", "semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    per_doc = (
        grams.groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_grams"))
    )
    out = (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .join(verified, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        )
    )
    return out.where(F.col("n_hits") == 0)
