"""Bloom-filter membership catalog entries (operators.bloom).

Two entries, two kinds of evidence:

- ``bloom_membership_documents`` pins the SKETCH itself: the DuckDB
  oracle replays filter sizing, build (md5 bit positions, bit_or word
  packing) and probe bit-for-bit, FALSE POSITIVES INCLUDED — the
  portability contract (any engine with md5 reproduces the exact
  filter) made hash-checkable.
- ``bloom_decontaminate_documents`` pins the PRODUCTION property: the
  bloom is a pre-filter, not an approximation — exact verification of
  the bloom-positive sliver makes the result bit-identical to the
  plain exact join, so its oracle is sketch-free SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import bloom as B
from ..sources.tables import load_table
from .registry import register

def _bench_pred():
    """Shared fixture split: every 13th document stands in as the
    eval benchmark (the decontaminate_fraction_documents split, so
    the planted near-copies give real cross-slice 5-gram overlap).
    A function, not a module constant — Column construction needs an
    active SparkContext."""
    return F.col("doc_id") % 13 == 0


_BLOOM_MEMBERSHIP_ORACLE = """
    WITH pool AS (
      SELECT doc_id, string_split(text, ' ') AS tk
      FROM documents WHERE doc_id % 13 <> 0
    ), bencht AS (
      SELECT string_split(text, ' ') AS tk
      FROM documents WHERE doc_id % 13 = 0
    ), bfp AS (
      SELECT DISTINCT md5(g) AS fp FROM (
        SELECT unnest(list_transform(
                 generate_series(1, greatest(len(tk) - 4, 0)),
                 i -> array_to_string(list_slice(tk, i, i + 4), ' ')))
                 AS g
        FROM bencht)
    ), m AS (
      -- sized_m_bits: 16 bits/key rounded up to a whole 32-bit word
      SELECT ((16 * COUNT(*) + 31) // 32) * 32 AS m_bits FROM bfp
    ), bpos AS (
      SELECT CAST(('0x' || substr(md5(fp || '#' || i), 1, 8)) AS BIGINT)
               % (SELECT m_bits FROM m) AS pos
      FROM bfp, (SELECT unnest(generate_series(0, 3)) AS i)
    ), words AS (
      SELECT pos // 32 AS wi,
             bit_or((1::BIGINT << CAST(pos % 32 AS INT))) AS word
      FROM bpos GROUP BY 1
    ), pg AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(tk) - 4, 0)),
               i -> md5(array_to_string(list_slice(tk, i, i + 4), ' ')))))
               AS fp
      FROM pool
    ), probe AS (
      SELECT doc_id, fp,
             CAST(('0x' || substr(md5(fp || '#' || i), 1, 8)) AS BIGINT)
               % (SELECT m_bits FROM m) AS pos
      FROM pg, (SELECT unnest(generate_series(0, 3)) AS i)
    ), gver AS (
      SELECT doc_id, fp,
             bool_and(COALESCE(
               (w.word & (1::BIGINT << CAST(p.pos % 32 AS INT))) <> 0,
               FALSE)) AS maybe
      FROM probe p LEFT JOIN words w ON w.wi = p.pos // 32
      GROUP BY doc_id, fp
    ), cnt AS (
      SELECT doc_id, COUNT(*) AS n_grams,
             SUM(CASE WHEN maybe THEN 1 ELSE 0 END) AS n_maybe
      FROM gver GROUP BY doc_id
    )
    SELECT p.doc_id,
           CAST(COALESCE(c.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(c.n_maybe, 0) AS BIGINT) AS n_maybe
    FROM (SELECT doc_id FROM documents WHERE doc_id % 13 <> 0) p
    LEFT JOIN cnt c USING (doc_id)
"""


@register("bloom_membership_documents", oracle=_BLOOM_MEMBERSHIP_ORACLE)
def bloom_membership_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom filter, sketch-level parity
    (operators.bloom.ngram_bloom_counts): a filter sized at 16
    bits/key (k=4 probes, ~0.2 % fp) builds over the benchmark
    slice's distinct 5-gram md5 digests, and every pool document's
    grams probe it MAP-SIDE against the broadcast word array. Output
    is (doc_id, n_grams, n_maybe) where n_maybe counts
    bloom-positive grams — false positives included. The oracle
    replays sizing, build, and probe bit-for-bit in DuckDB: the
    md5-only arithmetic (positions, 32-bit word packing via bit_or)
    is the property that lets ANY engine reproduce the exact same
    filter, which is what makes a bloom artifact shareable across
    the ingest stack."""
    docs = load_table(spark, sf_dir, "documents")
    return B.ngram_bloom_counts(
        docs.where(~_bench_pred()), docs.where(_bench_pred())
    )


_BLOOM_DECONTAM_ORACLE = """
    WITH pool AS (
      SELECT doc_id, string_split(text, ' ') AS tk
      FROM documents WHERE doc_id % 13 <> 0
    ), bencht AS (
      SELECT string_split(text, ' ') AS tk
      FROM documents WHERE doc_id % 13 = 0
    ), bfp AS (
      SELECT DISTINCT md5(g) AS fp FROM (
        SELECT unnest(list_transform(
                 generate_series(1, greatest(len(tk) - 4, 0)),
                 i -> array_to_string(list_slice(tk, i, i + 4), ' ')))
                 AS g
        FROM bencht)
    ), pg AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(tk) - 4, 0)),
               i -> md5(array_to_string(list_slice(tk, i, i + 4), ' ')))))
               AS fp
      FROM pool
    ), cnt AS (
      SELECT doc_id, COUNT(*) AS n_grams,
             SUM(CASE WHEN fp IN (SELECT fp FROM bfp) THEN 1 ELSE 0 END)
               AS n_hits
      FROM pg GROUP BY doc_id
    ), flagged AS (
      SELECT p.doc_id,
             CAST(COALESCE(c.n_grams, 0) AS BIGINT) AS n_grams,
             CAST(COALESCE(c.n_hits, 0) AS BIGINT) AS n_hits
      FROM (SELECT doc_id FROM documents WHERE doc_id % 13 <> 0) p
      LEFT JOIN cnt c USING (doc_id)
    )
    SELECT doc_id, n_grams, n_hits FROM flagged WHERE n_hits = 0
"""


@register("bloom_decontaminate_documents", oracle=_BLOOM_DECONTAM_ORACLE)
def bloom_decontaminate_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ANY-hit decontamination through the Bloom pre-filter
    (operators.bloom.decontaminate_bloom): a pool document dies if
    EVEN ONE of its distinct 5-grams appears in the benchmark slice.
    The filter removes ~99.8 % of grams from the exact-verify join's
    probe side; exact verification removes the filter's false
    positives, so the oracle is deliberately SKETCH-FREE SQL — the
    hash match proves the bloom changes the plan (map-side prefilter
    instead of a corpus-sized join) and not the answer. The 100 TB
    reading: the benchmark digest table can be arbitrarily large
    (beyond any broadcast ceiling) while its 16-bit/key filter still
    broadcasts, and the corpus-sized gram table never reaches an
    exchange."""
    docs = load_table(spark, sf_dir, "documents")
    return B.decontaminate_bloom(
        docs.where(~_bench_pred()), docs.where(_bench_pred())
    )


@register("streaming_bloom_membership", oracle=_BLOOM_MEMBERSHIP_ORACLE)
def streaming_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The membership filter maintained at ingest latency
    (streaming.bloom_stream): the benchmark slice arrives as three
    micro-batches, each folds its 5-gram digests into filter words
    (batch-keyed partitions), and the filter cut from the store is
    BIT-IDENTICAL to the one-shot build — bitwise OR is commutative,
    associative and IDEMPOTENT, so any batch split, arrival order,
    replay, or even double-delivery yields the same filter (the
    strongest replay algebra in the store family; duplicate-arrival
    pytest in tests/test_streaming.py). SHARES the batch entry's
    bit-for-bit DuckDB oracle, false positives included."""
    import glob
    import os
    import tempfile

    from ..operators.governance import ngram_phrases
    from ..streaming.bloom_stream import (
        bloom_words_from_store,
        run_streaming_bloom,
    )

    docs = load_table(spark, sf_dir, "documents")
    pool = docs.where(~_bench_pred())
    bench = docs.where(_bench_pred())
    # filter capacity fixed up front from the benchmark's key count
    # (a bloom cannot resize mid-stream; production sizes by capacity
    # planning) — the same sized_m_bits the one-shot build uses, so
    # the artifact and the oracle agree
    bench_fps = (
        bench.select(F.explode(ngram_phrases("text", 5)).alias("__g"))
        .select(F.md5("__g").alias("__fp"))
        .distinct()
    )
    m_bits = B.sized_m_bits(bench_fps.count())

    def key_fn(df):
        return df.select(
            F.explode(ngram_phrases("text", 5)).alias("__g")
        ).select(F.md5("__g").alias("__key"))

    tmp = tempfile.mkdtemp(prefix="stream_bloom_")
    watch = f"{tmp}/in"
    os.makedirs(watch, exist_ok=True)
    for i in range(3):
        stage = f"{tmp}/stage_{i}"
        bench.where(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{watch}/batch_{i:03d}.parquet"
        os.rename(part, dst)
        os.utime(dst, (1_700_000_000 + i * 60,) * 2)
    run_streaming_bloom(
        spark,
        watch,
        f"{tmp}/words",
        bench.schema,
        key_fn,
        m_bits=m_bits,
        k=4,
        checkpoint_dir=f"{tmp}/ckpt",
    )
    words = B.bloom_collect(
        bloom_words_from_store(spark, f"{tmp}/words"), m_bits
    )
    return B.ngram_counts_against_filter(pool, words, m_bits, k=4)
