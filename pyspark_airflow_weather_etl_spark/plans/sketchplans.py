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
