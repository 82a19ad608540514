"""Unigram-LM tokenizer catalog: seed-inventory kernel, trained piece
table, and Viterbi encoding (operators/unigram.py).

North-star extension (SURVEY.md §2.9): the second learned tokenizer
family next to BPE. The iteration-0 seed kernel (substring counts
capped + character closure) is SQL-expressible and ships hash-exact
against DuckDB — and so, since round 11, is the hard-EM (Viterbi)
TRAINING LOOP and the encode path: `_viterbi_chain` unrolls all 3 EM
rounds with the forward pass and backtracking as RECURSIVE CTEs
(best/backpointer lists carried per position; ties resolved as
lexicographic (score, l) struct max — provably Python's
strictly-greater/larger-l rule), so unigram_vocab_documents and
unigram_encode_documents are hash-exact; the independently written
pure-Python reference in tests/test_unigram.py is the second check.
Only the full-EM (forward-backward) production entry stays rows-only
— its float dict accumulation is order-defined per word but its twin
(unigram_vocab_em_fixed) pins the identical lattice hash-exactly."""

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
    ), subs AS MATERIALIZED (
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


def _viterbi_chain(em_iters=3, vocab_size=120, max_seed=200, min_freq=2):
    """Round-unrolled DuckDB replay of the PRODUCTION hard-EM
    (Viterbi) unigram trainer — upgrading unigram_vocab_documents
    from rows-only to hash-exact. Per round: Laplace log-probs
    (fixed-shape ln over exact ints), the Viterbi forward pass as a
    RECURSIVE CTE carrying the full best/backpointer lists
    (list_append per position; the tie rule 'strictly greater, ties
    to the larger l at the current boundary' is exactly lexicographic
    max over (score, l) structs because l is scanned ascending),
    backtracking as a second recursion walking backs[], then integer
    piece counts with the char-closure zero-floor. Dead lattice
    positions surface as -infinity scores (x + -inf = -inf in IEEE)
    and their backpointers are never on an alive chain, so the
    struct-max default (l of the last -inf candidate) cannot diverge
    from Python's skip. Final prune = top vocab_size by (cnt DESC,
    piece) + all single chars."""
    head = """
    WITH RECURSIVE wf AS MATERIALIZED (
      SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS w
            FROM documents)
      WHERE length(w) > 0 GROUP BY w
    ), subs AS MATERIALIZED (
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
      FROM subs WHERE piece_freq >= """ + str(min_freq) + """
    ), cnts0 AS MATERIALIZED (
      SELECT DISTINCT piece, piece_freq AS cnt FROM (
        SELECT piece, piece_freq FROM ranked WHERE rnk <= """ + str(max_seed) + """
        UNION ALL
        SELECT piece, piece_freq FROM subs WHERE length(piece) = 1
      )
    )"""
    rounds = []
    for r in range(1, em_iters + 1):
        rounds.append(f""", t{r} AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS nv
      FROM cnts{r - 1}
    ), lp{r} AS MATERIALIZED (
      SELECT c.piece,
             ln((CAST(c.cnt AS DOUBLE) + 1.0)
                / CAST(t.total + t.nv AS DOUBLE)) AS lp
      FROM cnts{r - 1} c CROSS JOIN t{r} t
    ), vf{r} AS (
      SELECT word, freq, 0 AS i,
             [CAST(0.0 AS DOUBLE)] AS bests, [0] AS backs
      FROM wf
      UNION ALL
      SELECT v.word, v.freq, v.i + 1,
             list_append(v.bests, cand['s']),
             list_append(v.backs, cand['l'])
      FROM (
        SELECT v.*, list_aggregate([
          CASE WHEN q1.lp IS NOT NULL
               THEN {{'s': v.bests[v.i + 1] + q1.lp, 'l': 1}}
               ELSE {{'s': '-infinity'::DOUBLE, 'l': 0}} END,
          CASE WHEN q2.lp IS NOT NULL
               THEN {{'s': v.bests[v.i] + q2.lp, 'l': 2}}
               ELSE {{'s': '-infinity'::DOUBLE, 'l': 0}} END,
          CASE WHEN q3.lp IS NOT NULL
               THEN {{'s': v.bests[v.i - 1] + q3.lp, 'l': 3}}
               ELSE {{'s': '-infinity'::DOUBLE, 'l': 0}} END,
          CASE WHEN q4.lp IS NOT NULL
               THEN {{'s': v.bests[v.i - 2] + q4.lp, 'l': 4}}
               ELSE {{'s': '-infinity'::DOUBLE, 'l': 0}} END
        ], 'max') AS cand
        FROM vf{r} v
        LEFT JOIN lp{r} q1 ON q1.piece = substr(v.word, v.i + 1, 1)
        LEFT JOIN lp{r} q2 ON v.i >= 1
                          AND q2.piece = substr(v.word, v.i, 2)
        LEFT JOIN lp{r} q3 ON v.i >= 2
                          AND q3.piece = substr(v.word, v.i - 1, 3)
        LEFT JOIN lp{r} q4 ON v.i >= 3
                          AND q4.piece = substr(v.word, v.i - 2, 4)
        WHERE v.i < length(v.word)
      ) v
    ), fin{r} AS MATERIALIZED (
      SELECT word, freq, backs
      FROM vf{r}
      WHERE i = length(word) AND isfinite(bests[length(word) + 1])
    ), bt{r} AS (
      SELECT word, freq, length(word) AS i, CAST([] AS VARCHAR[]) AS rev
      FROM fin{r}
      UNION ALL
      SELECT b.word, b.freq, b.i - f.backs[b.i + 1],
             list_append(b.rev,
               substr(b.word, b.i - f.backs[b.i + 1] + 1,
                      f.backs[b.i + 1]))
      FROM bt{r} b JOIN fin{r} f USING (word)
      WHERE b.i > 0
    ), cnt{r} AS MATERIALIZED (
      SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, unnest(rev) AS piece FROM bt{r} WHERE i = 0)
      GROUP BY piece
    ), cnts{r} AS MATERIALIZED (
      SELECT piece, cnt FROM cnt{r}
      UNION ALL
      SELECT c.piece, CAST(0 AS BIGINT) AS cnt
      FROM cnts{r - 1} c
      WHERE length(c.piece) = 1
        AND c.piece NOT IN (SELECT piece FROM cnt{r})
    )""")
    vocab_cte = f"""
    , topv AS (
      SELECT piece, cnt FROM (
        SELECT piece, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rn
        FROM cnts{em_iters}
      ) WHERE rn <= {vocab_size}
    ), vocabF AS MATERIALIZED (
      SELECT piece, cnt FROM topv
      UNION ALL
      SELECT piece, cnt FROM cnts{em_iters}
      WHERE length(piece) = 1
        AND piece NOT IN (SELECT piece FROM topv)
    )"""
    return head + "".join(rounds) + vocab_cte


def _viterbi_unrolled_oracle(em_iters=3, vocab_size=120, max_seed=200, min_freq=2):
    return (
        _viterbi_chain(em_iters, vocab_size, max_seed, min_freq)
        + "\n    SELECT piece, cnt FROM vocabF\n    "
    )


def _viterbi_encode_oracle(em_iters=3, vocab_size=120, max_seed=200, min_freq=2):
    """Encode oracle over the TRAINED inventory: the full training
    chain derives the final vocab in-query, a fourth Viterbi pass
    segments every distinct word under its smoothed log-probs, and
    documents reassemble in word order (the bpe_encode_unrolled
    pattern) — OOV words (unsegmentable: dead lattice end) keep a
    NULL slot, dropped from the piece stream and counted."""
    chain = _viterbi_chain(em_iters, vocab_size, max_seed, min_freq)
    return chain + """
    , tF AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS nv
      FROM vocabF
    ), lpF AS MATERIALIZED (
      SELECT c.piece,
             ln((CAST(c.cnt AS DOUBLE) + 1.0)
                / CAST(t.total + t.nv AS DOUBLE)) AS lp
      FROM vocabF c CROSS JOIN tF t
    ), vfF AS (
      SELECT word, 0 AS i,
             [CAST(0.0 AS DOUBLE)] AS bests, [0] AS backs
      FROM wf
      UNION ALL
      SELECT v.word, v.i + 1,
             list_append(v.bests, cand['s']),
             list_append(v.backs, cand['l'])
      FROM (
        SELECT v.*, list_aggregate([
          CASE WHEN q1.lp IS NOT NULL
               THEN {'s': v.bests[v.i + 1] + q1.lp, 'l': 1}
               ELSE {'s': '-infinity'::DOUBLE, 'l': 0} END,
          CASE WHEN q2.lp IS NOT NULL
               THEN {'s': v.bests[v.i] + q2.lp, 'l': 2}
               ELSE {'s': '-infinity'::DOUBLE, 'l': 0} END,
          CASE WHEN q3.lp IS NOT NULL
               THEN {'s': v.bests[v.i - 1] + q3.lp, 'l': 3}
               ELSE {'s': '-infinity'::DOUBLE, 'l': 0} END,
          CASE WHEN q4.lp IS NOT NULL
               THEN {'s': v.bests[v.i - 2] + q4.lp, 'l': 4}
               ELSE {'s': '-infinity'::DOUBLE, 'l': 0} END
        ], 'max') AS cand
        FROM vfF v
        LEFT JOIN lpF q1 ON q1.piece = substr(v.word, v.i + 1, 1)
        LEFT JOIN lpF q2 ON v.i >= 1
                        AND q2.piece = substr(v.word, v.i, 2)
        LEFT JOIN lpF q3 ON v.i >= 2
                        AND q3.piece = substr(v.word, v.i - 1, 3)
        LEFT JOIN lpF q4 ON v.i >= 3
                        AND q4.piece = substr(v.word, v.i - 2, 4)
        WHERE v.i < length(v.word)
      ) v
    ), finF AS MATERIALIZED (
      SELECT word, backs
      FROM vfF
      WHERE i = length(word) AND isfinite(bests[length(word) + 1])
    ), btF AS (
      SELECT word, length(word) AS i, CAST([] AS VARCHAR[]) AS rev
      FROM finF
      UNION ALL
      SELECT b.word, b.i - f.backs[b.i + 1],
             list_append(b.rev,
               substr(b.word, b.i - f.backs[b.i + 1] + 1,
                      f.backs[b.i + 1]))
      FROM btF b JOIN finF f USING (word)
      WHERE b.i > 0
    ), wp AS MATERIALIZED (
      SELECT word, list_reverse(rev) AS pieces FROM btF WHERE i = 0
    ), docw AS MATERIALIZED (
      SELECT d.doc_id, t.i AS pos, t.w AS word
      FROM documents d, LATERAL (
        SELECT i.i, a.arr[i.i] AS w
        FROM (SELECT regexp_split_to_array(d.text, '\\s+') AS arr) a,
             LATERAL (SELECT unnest(generate_series(1, len(a.arr)))
                      AS i) i
      ) t
      WHERE length(t.w) > 0
    )
    SELECT dw.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(CASE WHEN wp.pieces IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oov_words,
           CAST(COALESCE(SUM(len(wp.pieces)), 0) AS BIGINT) AS n_pieces,
           COALESCE(string_agg(array_to_string(wp.pieces, ' '), ' '
                      ORDER BY dw.pos)
                    FILTER (WHERE wp.pieces IS NOT NULL), '') AS pieces
    FROM docw dw LEFT JOIN wp USING (word)
    GROUP BY dw.doc_id
    """


@register(
    "unigram_vocab_documents",
    oracle=_viterbi_unrolled_oracle(
        em_iters=_EM_ITERS,
        vocab_size=_VOCAB_SIZE,
        max_seed=_MAX_SEED,
        min_freq=_MIN_FREQ,
    ),
)
def unigram_vocab_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained unigram piece inventory
    (operators.unigram.unigram_train, hard-EM/Viterbi variant, 3 EM
    rounds, vocab 120 + character closure): (piece, cnt) with integer
    Viterbi counts. Rows-only for the driver (an EM loop is not one
    SQL query); the full table is hash-checked against an independent
    pure-Python EM reference in tests/test_unigram.py."""
    return U.vocab_df(spark, _trained(spark, sf_dir))


@register(
    "unigram_encode_documents",
    oracle=_viterbi_encode_oracle(
        em_iters=_EM_ITERS,
        vocab_size=_VOCAB_SIZE,
        max_seed=_MAX_SEED,
        min_freq=_MIN_FREQ,
    ),
)
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


def _em_fixed_oracle(em_iters: int = 2) -> str:
    """Round-unrolled DuckDB replay of the portable EM twin
    (operators.unigram.unigram_em_fixed_counts) — the kmeansplans
    _unrolled_oracle pattern extended with RECURSIVE CTEs: per round,
    the forward (alpha) and backward (beta) lattice recurrences run as
    recursive CTEs carrying the last 4 positions' values, with the
    float term ORDER matched token-for-token to the Python E-step
    (l ascending, left-associative adds, zero-filled missing terms —
    adding exact 0.0 to a non-negative double is the identity); each
    posterior term floor-quantizes through the identical expression
    ``floor(a * p * b / z * 1000000.0)`` so all summation is integer.
    The vocabulary is frozen at the seed set, so the Laplace
    denominator (total, V) is derivable per round."""
    head = """
    WITH RECURSIVE wf AS MATERIALIZED (
      SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS w
            FROM documents)
      WHERE length(w) > 0 GROUP BY w
    ), subs AS MATERIALIZED (
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
    ), seed AS (
      -- DISTINCT over UNION ALL, not UNION: inside WITH RECURSIVE,
      -- DuckDB reads a CTE-level UNION as the base/iteration
      -- separator and does NOT dedup across the two branches
      SELECT DISTINCT piece, piece_freq FROM (
        SELECT piece, piece_freq FROM ranked WHERE rnk <= 200
        UNION ALL
        SELECT piece, piece_freq FROM subs WHERE length(piece) = 1
      )
    ), v0 AS MATERIALIZED (
      SELECT piece, CAST(piece_freq * 1000000 AS BIGINT) AS c FROM seed
    )"""
    rounds = []
    for r in range(1, em_iters + 1):
        rounds.append(f""", t{r} AS (
      SELECT CAST(SUM(c) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS nv
      FROM v{r - 1}
    ), p{r} AS MATERIALIZED (
      SELECT v.piece,
             CAST(v.c + 1000000 AS DOUBLE)
               / CAST(t.total + t.nv * 1000000 AS DOUBLE) AS p
      FROM v{r - 1} v CROSS JOIN t{r} t
    ), a{r} AS (
      SELECT word, 0 AS i,
             CAST(1.0 AS DOUBLE) AS c0, CAST(0.0 AS DOUBLE) AS c1,
             CAST(0.0 AS DOUBLE) AS c2, CAST(0.0 AS DOUBLE) AS c3
      FROM wf
      UNION ALL
      SELECT a.word, a.i + 1,
             a.c0 * COALESCE(q1.p, 0.0) + a.c1 * COALESCE(q2.p, 0.0)
               + a.c2 * COALESCE(q3.p, 0.0) + a.c3 * COALESCE(q4.p, 0.0),
             a.c0, a.c1, a.c2
      FROM a{r} a
      LEFT JOIN p{r} q1 ON q1.piece = substr(a.word, a.i + 1, 1)
      LEFT JOIN p{r} q2 ON a.i >= 1 AND q2.piece = substr(a.word, a.i, 2)
      LEFT JOIN p{r} q3 ON a.i >= 2
                       AND q3.piece = substr(a.word, a.i - 1, 3)
      LEFT JOIN p{r} q4 ON a.i >= 3
                       AND q4.piece = substr(a.word, a.i - 2, 4)
      WHERE a.i < length(a.word)
    ), b{r} AS (
      SELECT word, length(word) AS i,
             CAST(1.0 AS DOUBLE) AS c0, CAST(0.0 AS DOUBLE) AS c1,
             CAST(0.0 AS DOUBLE) AS c2, CAST(0.0 AS DOUBLE) AS c3
      FROM wf
      UNION ALL
      SELECT b.word, b.i - 1,
             COALESCE(q1.p, 0.0) * b.c0 + COALESCE(q2.p, 0.0) * b.c1
               + COALESCE(q3.p, 0.0) * b.c2 + COALESCE(q4.p, 0.0) * b.c3,
             b.c0, b.c1, b.c2
      FROM b{r} b
      LEFT JOIN p{r} q1 ON q1.piece = substr(b.word, b.i, 1)
      LEFT JOIN p{r} q2 ON b.i + 1 <= length(b.word)
                       AND q2.piece = substr(b.word, b.i, 2)
      LEFT JOIN p{r} q3 ON b.i + 2 <= length(b.word)
                       AND q3.piece = substr(b.word, b.i, 3)
      LEFT JOIN p{r} q4 ON b.i + 3 <= length(b.word)
                       AND q4.piece = substr(b.word, b.i, 4)
      WHERE b.i > 0
    ), zf{r} AS MATERIALIZED (
      SELECT word, c0 AS z FROM a{r} WHERE i = length(word)
    ), cnt{r} AS (
      SELECT p.piece AS piece,
             CAST(SUM(w.freq * CAST(floor(
               af.c0 * p.p * bf.c0 / z.z * 1000000.0) AS BIGINT))
               AS BIGINT) AS c
      FROM wf w,
           LATERAL (SELECT unnest(generate_series(1, length(w.word)))
                    AS i) ti,
           LATERAL (SELECT unnest(generate_series(1, least(4, ti.i)))
                    AS l) tl,
           p{r} p, a{r} af, b{r} bf, zf{r} z
      WHERE p.piece = substr(w.word, ti.i - tl.l + 1, tl.l)
        AND af.word = w.word AND af.i = ti.i - tl.l
        AND bf.word = w.word AND bf.i = ti.i
        AND z.word = w.word AND z.z > 0
      GROUP BY p.piece
    ), v{r} AS MATERIALIZED (
      SELECT v.piece, COALESCE(s.c, 0) AS c
      FROM v0 v LEFT JOIN cnt{r} s ON v.piece = s.piece
    )""")
    final = f"""
    SELECT piece, CAST(c AS BIGINT) AS cnt FROM v{em_iters}
    """
    return head + "".join(rounds) + final


@register("unigram_vocab_em_fixed", oracle=_em_fixed_oracle(em_iters=2))
def unigram_vocab_em_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable hash-exact twin of the full-EM trainer
    (operators.unigram.unigram_em_fixed_counts): frozen seed
    vocabulary, forward-backward posteriors with per-term floor
    quantization to integer micro-units, 2 unrolled EM rounds — the
    DuckDB oracle replays the ENTIRE loop (seed inventory → per-round
    probs → both lattice recurrences via recursive CTEs → quantized
    posterior counts) bit-for-bit, closing the hash-exactness gap the
    rows-only unigram_vocab_em_documents entry leaves open."""
    docs = load_table(spark, sf_dir, "documents")
    return U.unigram_em_fixed_counts(
        docs,
        max_piece_len=_MAX_PIECE_LEN,
        min_freq=_MIN_FREQ,
        max_seed=_MAX_SEED,
        em_iters=2,
    )
