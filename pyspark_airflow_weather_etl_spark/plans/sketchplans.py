"""Count-min sketch catalog entries (operators.sketch). Both oracles
replay the sketch bit-for-bit in DuckDB — md5 bucket arithmetic,
integer cell counts, min-over-rows estimates — the portability
contract that lets the artifact cross engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sketch as S
from ..operators.text import tokens
from ..sources.tables import load_table
from .registry import register

# fixed sketch geometry for the catalog entries: d=4 rows of w=64
# counters. Deliberately TIGHT for the fixture's 31-token vocabulary
# so collisions actually occur and the one-sided estimate property is
# exercised (tests/test_sketch.py pins est >= true on every key).
_W, _D = 64, 4


def _token_stream(docs: DataFrame) -> DataFrame:
    return docs.select(F.explode(tokens("text")).alias("tok")).where(
        F.length("tok") > 0
    )


_CMS_CELLS = """
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), t AS (SELECT tok FROM toks WHERE length(tok) > 0),
    cells AS (
      SELECT i AS row_idx,
             CAST(('0x' || substr(md5(tok || '#' || i), 1, 8)) AS BIGINT)
               % 64 AS bucket
      FROM t, (SELECT unnest(generate_series(0, 3)) AS i)
    )
    SELECT CAST(row_idx AS INT) AS row_idx, bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM cells GROUP BY 1, 2
"""


@register("cms_token_counts", oracle=_CMS_CELLS)
def cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min sketch TABLE over the corpus token multiset
    (operators.sketch.cms_build, d=4 x w=64): at most d*w counter
    cells regardless of vocabulary — the bounded-size frequency
    artifact. Build state collapses map-side to d*w groups (the
    shuffle is sketch-sized, not vocabulary-sized); cells are exact
    integers, additive across any batch split. Hash-exact vs the
    DuckDB replay of the same md5 bucket arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    return S.cms_build(_token_stream(docs), "tok", w=_W, d=_D)


_CMS_HEAVY = """
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), t AS (SELECT tok FROM toks WHERE length(tok) > 0),
    cells AS (
      SELECT i AS row_idx,
             CAST(('0x' || substr(md5(tok || '#' || i), 1, 8)) AS BIGINT)
               % 64 AS bucket
      FROM t, (SELECT unnest(generate_series(0, 3)) AS i)
    ), sk AS (
      SELECT row_idx, bucket, COUNT(*) AS cnt FROM cells GROUP BY 1, 2
    ), n AS (SELECT COUNT(*) AS n_total FROM t),
    dk AS (SELECT DISTINCT tok AS key FROM t),
    probe AS (
      SELECT key, i,
             CAST(('0x' || substr(md5(key || '#' || i), 1, 8)) AS BIGINT)
               % 64 AS bucket
      FROM dk, (SELECT unnest(generate_series(0, 3)) AS i)
    ), est AS (
      SELECT key, min(COALESCE(s.cnt, 0)) AS est_count
      FROM probe p
      LEFT JOIN sk s ON s.row_idx = p.i AND s.bucket = p.bucket
      GROUP BY key
    )
    SELECT key, CAST(est_count AS BIGINT) AS est_count
    FROM est WHERE est_count * 64 >= (SELECT n_total FROM n)
"""


@register("cms_heavy_hitter_tokens", oracle=_CMS_HEAVY)
def cms_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters THROUGH the sketch
    (operators.sketch.cms_heavy_hitters): tokens whose count-min
    estimate reaches 1/64 of the total stream (integer
    cross-multiplied threshold). One-sided guarantee: est >= true, so
    every truly-heavy token is reported — collisions can only ADD
    borderline keys, never hide one. The probe is map-side against
    the broadcast d-array artifact; the only corpus-sized exchange is
    the candidate distinct a frequency report needs anyway.
    Hash-exact vs the full DuckDB replay (build + probe + threshold),
    estimates included."""
    docs = load_table(spark, sf_dir, "documents")
    return S.cms_heavy_hitters(
        _token_stream(docs), "tok", w=_W, d=_D, frac_denom=64
    )


_SPLIT_ORACLE = """
    SELECT doc_id,
           CASE WHEN draw < 98 THEN 'train'
                WHEN draw < 99 THEN 'validation'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
               || ':split-v1'), 1, 8)) AS BIGINT) % 100 AS draw
      FROM documents
    )
"""


@register("corpus_split_documents", oracle=_SPLIT_ORACLE)
def corpus_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split
    (operators.governance.split_corpus, 98/1/1): the assignment is a
    pure function of (doc_id, salt) — stable under re-runs,
    repartitioning, and corpus growth (a new document never moves an
    old one across splits, so yesterday's held-out set stays held
    out), and pure per-row codegen (zero shuffles). Hash-exact vs
    the DuckDB replay of the md5 draw."""
    from ..operators.governance import split_corpus

    docs = load_table(spark, sf_dir, "documents")
    return split_corpus(docs).select("doc_id", "split")


@register("streaming_cms_token_counts", oracle=_CMS_CELLS)
def streaming_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min sketch maintained at ingest latency
    (streaming.cms_stream): documents arrive as three micro-batches,
    each folds into at most d*w integer cells (batch-keyed dynamic
    overwrite — crash replay rewrites its own partition, never
    double-counts), and the sketch cut from the store is
    BIT-IDENTICAL to the one-shot batch build — integer cells are
    exactly additive, so the streaming decomposition provably loses
    nothing. SHARES the batch entry's oracle (the DuckDB bit-for-bit
    replay of cms_token_counts); crash-replay pinned in
    tests/test_streaming.py."""
    import glob
    import os
    import tempfile

    from ..operators.text import tokens as _tokens
    from ..streaming.cms_stream import (
        cms_cells_from_store,
        run_streaming_cms,
    )

    tmp = tempfile.mkdtemp(prefix="stream_cms_")
    docs = load_table(spark, sf_dir, "documents")

    def key_fn(df):
        return df.select(F.explode(_tokens("text")).alias("__key")).where(
            F.length("__key") > 0
        )

    watch = f"{tmp}/in"
    os.makedirs(watch, exist_ok=True)
    for i in range(3):
        stage = f"{tmp}/stage_{i}"
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{watch}/batch_{i:03d}.parquet"
        os.rename(part, dst)
        os.utime(dst, (1_700_000_000 + i * 60,) * 2)
    run_streaming_cms(
        spark,
        watch,
        f"{tmp}/cells",
        docs.schema,
        key_fn,
        w=_W,
        d=_D,
        checkpoint_dir=f"{tmp}/ckpt",
    )
    return cms_cells_from_store(spark, f"{tmp}/cells")


_HLL_NGRAM_SOURCE = """
    WITH g AS (
      SELECT md5(array_to_string(list_slice(tk, i, i + 4), ' ')) AS fp
      FROM (SELECT string_split(text, ' ') AS tk FROM documents),
           LATERAL (SELECT unnest(
             generate_series(1, greatest(len(tk) - 4, 0))) AS i)
    ), h AS (
      SELECT CAST(('0x' || substr(md5(fp), 1, 15)) AS BIGINT) AS h FROM g
    ), r AS (
      SELECT CAST(h % 256 AS INT) AS bucket, h // 256 AS w FROM h
    ), rho AS (
      SELECT bucket,
             CASE WHEN w = 0 THEN 53
                  ELSE length(bin(w)) - length(rtrim(bin(w), '0')) + 1
             END AS rho
      FROM r
    ), regs AS (
      SELECT bucket, max(rho) AS max_rho FROM rho GROUP BY bucket
    )
"""


@register(
    "hll_registers_ngrams",
    oracle=_HLL_NGRAM_SOURCE
    + " SELECT bucket, CAST(max_rho AS INT) AS max_rho FROM regs",
)
def hll_registers_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog registers over the corpus 5-gram digests
    (operators.sketch.hll_build, m=256): 60-bit md5 hash, bucket =
    low 8 bits, rho = trailing zeros of the payload + 1 (bin/rtrim
    string arithmetic — no platform log2). At most 256 rows whatever
    the key cardinality; registers merge by MAX (idempotent — the
    property that makes it a DISTINCT counter). Hash-exact vs the
    DuckDB bit-for-bit replay — the cross-engine-checkable twin of
    the engine-internal approx_count_distinct entry."""
    from ..operators.governance import ngram_phrases

    docs = load_table(spark, sf_dir, "documents")
    fps = docs.select(
        F.explode(ngram_phrases("text", 5)).alias("__g")
    ).select(F.md5("__g").alias("__fp"))
    return S.hll_build(fps, "__fp")


@register(
    "hll_distinct_ngrams",
    oracle=_HLL_NGRAM_SOURCE
    + """
    , agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_used_buckets,
             CAST(SUM((1::BIGINT << CAST(53 - max_rho AS INT)))
               AS BIGINT) AS used_sum
      FROM regs
    ), s AS (
      SELECT n_used_buckets,
             used_sum + (256 - n_used_buckets) * (1::BIGINT << 53)
               AS int_harmonic_sum
      FROM agg
    ), raw AS (
      SELECT *,
             CAST('0.7182725932495458' AS DOUBLE) * CAST(256 AS DOUBLE)
               * CAST(256 AS DOUBLE) * CAST(9007199254740992 AS DOUBLE)
               / CAST(int_harmonic_sum AS DOUBLE) AS r
      FROM s
    )
    SELECT n_used_buckets, int_harmonic_sum,
           round(CASE WHEN r <= 640.0 AND n_used_buckets < 256
                      THEN CAST(256 AS DOUBLE) * ln(CAST(256 AS DOUBLE)
                        / CAST(256 - n_used_buckets AS DOUBLE))
                      ELSE r END, 6) AS estimate
    FROM raw
    """,
)
def hll_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL distinct-count estimate from those registers
    (operators.sketch.hll_estimate): the harmonic sum is the EXACT
    INTEGER sum(2^(53-rho)) (every term a power of two, 256 of them
    — exact in a BIGINT; empty buckets contribute 2^53), and the only
    float arithmetic is one literal-constant multiply chain + one
    division + round(6) — same expression shape in the oracle, so
    even the ESTIMATE hash-matches across engines. Linear-counting
    small-range branch included (one ln — the engine's sanctioned
    float shape); accuracy vs the true distinct count pinned in
    tests/test_sketch.py (~4% on the fixture, sigma = 1.04/sqrt(256)
    = 6.5%)."""
    from ..operators.governance import ngram_phrases

    docs = load_table(spark, sf_dir, "documents")
    fps = docs.select(
        F.explode(ngram_phrases("text", 5)).alias("__g")
    ).select(F.md5("__g").alias("__fp"))
    return S.hll_estimate(S.hll_build(fps, "__fp"))
