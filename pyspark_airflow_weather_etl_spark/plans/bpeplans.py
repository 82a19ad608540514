"""BPE tokenizer-training catalog: pair-count kernel, merge-rule
learning, and piece encoding (operators/bpe.py).

North-star extension (SURVEY.md §2.9 — the reference,
`/root/reference/spark_jobs/*.py`, has no tokenization surface). The
iteration-0 pair-count kernel is SQL-expressible and ships hash-exact
against DuckDB; the training loop itself is an iterative driver-side
argmax (not expressible as one SQL query), so the merge/encode
entries are rows-only for the driver and hash-checked in
tests/test_bpe.py against a pure-Python reference implementation of
the same semantics — the `dedup_clusters_jaccard` evidence pattern
for iterative algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import bpe as B
from ..sources.tables import load_table
from .registry import register

#: One trained rule list per (sf_dir, k, min_freq) — the driver and
#: bench call `queries()` entries repeatedly in one session; training
#: is deterministic, so caching is purely a latency matter.
_MERGE_CACHE: dict[tuple[str, int, int], list[B.Merge]] = {}

_NUM_MERGES = 24
_MIN_FREQ = 2


def _trained(spark: SparkSession, sf_dir: str) -> list[B.Merge]:
    key = (sf_dir, _NUM_MERGES, _MIN_FREQ)
    if key not in _MERGE_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        _MERGE_CACHE[key] = B.bpe_train(
            docs, num_merges=_NUM_MERGES, min_freq=_MIN_FREQ
        )
    return _MERGE_CACHE[key]


@register(
    "bpe_pair_counts_documents",
    oracle="""
    WITH words AS (
      SELECT w AS word, COUNT(*) AS freq
      FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS w
            FROM documents)
      WHERE length(w) > 0 GROUP BY w
    )
    SELECT substr(word, i, 1) AS lhs, substr(word, i + 1, 1) AS rhs,
           CAST(SUM(freq) AS BIGINT) AS pair_freq
    FROM words,
         LATERAL (SELECT unnest(generate_series(1, length(word) - 1)) AS i) t
    WHERE length(word) >= 2
    GROUP BY lhs, rhs
    """,
)
def bpe_pair_counts_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE iteration-0 kernel (operators.bpe.bpe_pair_counts): the
    adjacent character-pair counts over the word-frequency table —
    the aggregation every training round repeats on progressively
    merged symbols, and the ONE corpus-shaped piece of the trainer
    (the word groupBy collapses the corpus to a vocab-sized frame;
    rounds after that never touch the corpus again). Hash-exact vs
    the DuckDB lateral generate_series replay."""
    docs = load_table(spark, sf_dir, "documents")
    return bpe_pair_counts_frame(docs)


def bpe_pair_counts_frame(docs: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return B.bpe_pair_counts(docs).select(
        F.col("left").alias("lhs"),
        F.col("right").alias("rhs"),
        "pair_freq",
    )


@register("bpe_merges_documents")
def bpe_merges_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned BPE merge table (operators.bpe.bpe_train, k=24,
    min_freq=2): (merge_rank, left, right, merged, pair_freq) in
    training order. Deterministic — argmax tiebreak is (freq DESC,
    left, right). Rows-only for the driver (iterative driver-side
    argmax, not one SQL query); the full rule sequence is hash-checked
    against a pure-Python reference in tests/test_bpe.py."""
    return B.merges_df(spark, _trained(spark, sf_dir))


@register("bpe_encode_documents")
def bpe_encode_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents encoded with the learned merges
    (operators.bpe.bpe_encode): (doc_id, n_words, n_pieces, pieces).
    Encode cost is per DISTINCT word (Arrow-batched min-rank merge
    loop) + one doc_id shuffle for in-order reassembly. Rows-only for
    the driver; piece-level parity with the Python reference encoder
    (and the lossless-roundtrip property) is asserted in
    tests/test_bpe.py."""
    docs = load_table(spark, sf_dir, "documents")
    return B.bpe_encode(docs, _trained(spark, sf_dir))
