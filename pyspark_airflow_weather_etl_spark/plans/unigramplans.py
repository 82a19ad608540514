"""Unigram-LM tokenizer catalog: seed-inventory kernel, trained piece
table, and Viterbi encoding (operators/unigram.py).

North-star extension (SURVEY.md §2.9): the second learned tokenizer
family next to BPE. The iteration-0 seed kernel (substring counts
capped + character closure) is SQL-expressible and ships hash-exact
against DuckDB; the EM loop is driver-bounded iteration (not one SQL
query), so the vocab/encode entries are rows-only for the driver and
hash-checked in tests/test_unigram.py against an independently
written pure-Python reference — the bpeplans evidence pattern."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import unigram as U
from ..sources.tables import load_table
from .registry import register

_MAX_PIECE_LEN = 4
_MIN_FREQ = 2
_MAX_SEED = 200
_VOCAB_SIZE = 120
_EM_ITERS = 3

#: One trained inventory per sf_dir — deterministic, so caching is
#: purely a latency matter (the driver calls entries repeatedly).
_VOCAB_CACHE: dict[str, dict[str, int]] = {}


def _trained(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    if sf_dir not in _VOCAB_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        _VOCAB_CACHE[sf_dir] = U.unigram_train(
            docs,
            max_piece_len=_MAX_PIECE_LEN,
            min_freq=_MIN_FREQ,
            max_seed=_MAX_SEED,
            vocab_size=_VOCAB_SIZE,
            em_iters=_EM_ITERS,
        )
    return _VOCAB_CACHE[sf_dir]


@register(
    "unigram_seed_vocab_documents",
    oracle="""
    WITH wf AS (
      SELECT w AS word, COUNT(*) AS freq
      FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS w
            FROM documents)
      WHERE length(w) > 0 GROUP BY w
    ), subs AS (
      SELECT substr(word, s.i, l.l) AS piece,
             CAST(SUM(freq) AS BIGINT) AS piece_freq
      FROM wf,
           LATERAL (SELECT unnest(generate_series(1, length(word))) AS i) s,
           LATERAL (SELECT unnest(generate_series(1,
                      least(4, length(word) - s.i + 1))) AS l) l
      GROUP BY piece
    ), ranked AS (
      SELECT piece, piece_freq,
             ROW_NUMBER() OVER (ORDER BY piece_freq DESC, piece) AS rnk
      FROM subs WHERE piece_freq >= 2
    )
    SELECT piece, piece_freq FROM ranked WHERE rnk <= 200
    UNION
    SELECT piece, piece_freq FROM subs WHERE length(piece) = 1
    """,
)
def unigram_seed_vocab_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Unigram iteration-0 kernel (operators.unigram.seed_vocab):
    substring (length ≤ 4) counts over the word-frequency table,
    capped to the 200 most frequent above min_freq=2 (distributed
    rank — no single-partition window), UNION all single characters
    (the closure property every later EM round relies on). Hash-exact
    vs the DuckDB lateral-substring replay."""
    docs = load_table(spark, sf_dir, "documents")
    return U.seed_vocab(
        docs,
        max_piece_len=_MAX_PIECE_LEN,
        min_freq=_MIN_FREQ,
        max_seed=_MAX_SEED,
    )


@register("unigram_vocab_documents")
def unigram_vocab_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained unigram piece inventory
    (operators.unigram.unigram_train, hard-EM/Viterbi variant, 3 EM
    rounds, vocab 120 + character closure): (piece, cnt) with integer
    Viterbi counts. Rows-only for the driver (an EM loop is not one
    SQL query); the full table is hash-checked against an independent
    pure-Python EM reference in tests/test_unigram.py."""
    return U.vocab_df(spark, _trained(spark, sf_dir))


@register("unigram_encode_documents")
def unigram_encode_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents encoded with the trained unigram inventory
    (operators.unigram.unigram_encode): (doc_id, n_words, n_oov_words,
    n_pieces, pieces) — Viterbi per DISTINCT word (Arrow-batched),
    one doc_id shuffle for in-order reassembly. Rows-only; piece-level
    parity with the independent Python reference and the lossless
    round-trip property are asserted in tests/test_unigram.py."""
    docs = load_table(spark, sf_dir, "documents")
    return U.unigram_encode(
        docs, _trained(spark, sf_dir), max_piece_len=_MAX_PIECE_LEN
    )


@register("unigram_vocab_em_documents")
def unigram_vocab_em_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Full-EM unigram inventory (operators.unigram.unigram_train_em):
    forward-backward EXPECTED piece counts instead of hard Viterbi
    counts — SentencePiece's actual E-step. Determinism is engineered
    back in: per-word posteriors run in spec-pinned float order and
    quantize to integer micro-counts BEFORE aggregation, so the
    cluster-wide sum is exact integer arithmetic and the trained table
    is bit-identical on any partitioning. (piece, cnt) with cnt in
    micro-counts. Rows-only; equality with an independent pure-Python
    full-EM reference in tests/test_unigram.py."""
    return U.vocab_df(spark, _trained_em(spark, sf_dir))


_EM_CACHE: dict[str, dict[str, int]] = {}


def _trained_em(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    if sf_dir not in _EM_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        _EM_CACHE[sf_dir] = U.unigram_train_em(
            docs,
            max_piece_len=_MAX_PIECE_LEN,
            min_freq=_MIN_FREQ,
            max_seed=_MAX_SEED,
            vocab_size=_VOCAB_SIZE,
            em_iters=_EM_ITERS,
        )
    return _EM_CACHE[sf_dir]
