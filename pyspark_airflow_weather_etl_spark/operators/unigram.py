"""Distributed unigram-LM (SentencePiece-style) tokenizer training.

North-star extension beyond the reference surface (the reference,
`/root/reference/spark_jobs/*.py`, has no tokenization): the second
learned tokenizer family next to :mod:`.bpe` — Kudo 2018
(arXiv:1804.10959) subword regularization's unigram language model,
in its deterministic hard-EM (Viterbi) variant:

1. **Seed inventory**: every substring of length 1..L of every word,
   weighted by word frequency; keep substrings above ``min_freq``
   ranked (freq DESC, piece) and capped, plus ALL single characters
   (the closure property — every word stays segmentable). This
   iteration-0 kernel is SQL-expressible and ships as the hash-exact
   oracle entry ``unigram_seed_vocab_documents`` (the
   ``bpe_pair_counts_documents`` role).
2. **EM rounds** (driver-bounded iteration, the BPE/label-propagation
   precedent): E-step segments each DISTINCT word by Viterbi under
   the current piece log-probs (Arrow-batched UDF — the sanctioned
   Python path; the piece table rides the closure like BPE's rank
   dict) and counts the pieces used, weighted by word freq; M-step
   re-estimates probs from the integer counts with Laplace-1
   smoothing (p = (c+1)/(total+V): no −∞ for kept-but-unused pieces,
   no smoothing hyper-parameter search). Pieces with count 0 are
   dropped each round EXCEPT single characters.
3. **Final prune**: top ``vocab_size`` pieces by (count DESC, piece),
   plus all single characters.

Scale design — the same word-frequency collapse as BPE: ONE
corpus-sized shuffle (the word groupBy) reduces the input to the
distinct-word frame; every EM round is one Arrow pass + one
vocab-sized aggregation over that frame, never the corpus. Encoding
reuses the collapse: Viterbi once per distinct word, equi-join back,
one doc_id shuffle for in-order reassembly.

Viterbi determinism contract (what tests/test_unigram.py's
independent reference replays): positions scanned left to right;
``best[i] = max over piece lengths l`` of ``best[i-l] + logp``;
strict-greater updates, with equal scores broken toward the LARGER
``l`` at the current boundary (greedy-longest among ties). Scores are
float64 sums of float64 logs in a fixed order — deterministic on any
worker.

Catalog entries are rows-only for the trained artifacts (an EM loop
is not one SQL query); the full piece inventory and encode output are
hash-checked against an independently-written pure-Python reference
in tests/test_unigram.py, and the seed kernel is oracle-bearing.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.iterate import round_checkpoint

from .bpe import word_freqs


def seed_vocab(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    min_freq: int = 2,
    max_seed: int = 200,
    partitions: int | None = None,
) -> DataFrame:
    """Seed piece inventory: (piece, piece_freq) — substring counts
    over the word-frequency table, capped to the ``max_seed`` most
    frequent (ties → lexicographic) above ``min_freq``, UNION all
    single characters at any frequency. The rank uses the distributed
    rank primitive (:func:`.prefix.ranged_rank`) — at web scale the
    substring inventory is far beyond single-partition windows."""
    from .prefix import ranged_rank

    wf = word_freqs(df, text_col)
    n = F.length("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_piece_len), n - i + 1)
                ),
                lambda l: F.col("word").substr(i, l),
            ),
        )
    )
    counts = (
        wf.select("freq", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("piece_freq"))
    )
    eligible = counts.where(F.col("piece_freq") >= min_freq)
    order = [F.col("piece_freq").desc(), F.col("piece")]
    local, offsets = ranged_rank(
        eligible, order, partitions, "unigram_seed_vocab"
    )
    capped = (
        local.join(
            F.broadcast(offsets.select("__pid", "__rank_offset")), "__pid"
        )
        .where(
            (F.col("__local_rn") + F.col("__rank_offset")) <= max_seed
        )
        .select("piece", "piece_freq")
    )
    chars = counts.where(F.length("piece") == 1).select(
        "piece", "piece_freq"
    )
    return capped.union(chars).distinct()


def _viterbi_factory(logp: dict[str, float], max_piece_len: int):
    """Shared Viterbi segmenter (module docstring's determinism
    contract). Returns a plain ``word -> list[piece]`` function; the
    piece table is captured driver state, shipped once per executor."""

    def segment(word: str) -> list[str] | None:
        n = len(word)
        NEG = -math.inf
        best = [NEG] * (n + 1)
        back = [0] * (n + 1)
        best[0] = 0.0
        for i in range(1, n + 1):
            for l in range(1, min(max_piece_len, i) + 1):
                piece = word[i - l : i]
                lp = logp.get(piece)
                if lp is None or best[i - l] == NEG:
                    continue
                cand = best[i - l] + lp
                if cand > best[i] or (cand == best[i] and l > back[i]):
                    best[i] = cand
                    back[i] = l
        if best[n] == NEG:
            return None  # unsegmentable (a char fell out of vocab)
        out: list[str] = []
        i = n
        while i > 0:
            l = back[i]
            out.append(word[i - l : i])
            i -= l
        out.reverse()
        return out

    return segment


def _smoothed_logp(counts: dict[str, int]) -> dict[str, float]:
    """Laplace-1: p(piece) = (c+1)/(total+V) — defined for every kept
    piece, no zero-prob edge, no hyper-parameter."""
    total = sum(counts.values())
    v = len(counts)
    return {
        p: math.log((c + 1.0) / (total + v)) for p, c in counts.items()
    }


def _segment_udf(logp: dict[str, float], max_piece_len: int):
    seg = _viterbi_factory(logp, max_piece_len)

    # no type annotations: `from __future__ import annotations`
    # stringifies them and pandas_udf's inference rejects the strings
    def seg_batch(words):
        return words.map(seg)

    return F.pandas_udf(seg_batch, "array<string>")


#: 'auto' dispatch bound for DRIVER-SIDE unigram training (the BPE
#: round-14 playbook applied to the EM family, with DIFFERENT
#: economics): the E-step touches EVERY distinct word EVERY round in
#: both modes — there is no BPE-style touched-words asymmetry — so
#: driver mode only deletes the per-round job launch + Arrow
#: round-trip (~2.3 s/round measured) while giving up the cluster's
#: cores on the same Python kernel. It wins exactly where rounds are
#: LATENCY-bound. Measured on this box (BASELINE round 14, 3 EM
#: rounds, identical trained tables): 50k words — driver 15.8 s vs
#: distributed 11.1 s; 365k words — 77.9 s vs 22.9 s; fixture-scale
#: vocabs (hundreds of words) — driver deletes ~7 s of per-round
#: overhead. Crossover ≈ 30-35k words; 25k is the shipped
#: conservative bound — far below BPE's memory-bound 4M, because
#: unigram EM has no incremental trick to amortize. Production web
#: vocabs (10⁷-10⁸) stay distributed.
_DRIVER_EM_MAX_VOCAB = 25_000


def _em_word_state(
    df: DataFrame, text_col: str, mode: str, checkpoint_dir: str | None
):
    """Resolve the EM execution arm AND materialize (word, freq) ONCE
    (ADVICE r14: ``mode='auto'`` used to run a full ``word_freqs``
    count for dispatch and then recompute the frame from scratch in
    whichever arm ran — one redundant corpus scan per training call).
    Returns ``(words, wf)``: the driver arm gets the collected
    ``(word, freq)`` list (over Arrow) with ``wf=None``; the
    distributed arm gets the checkpointed frame with ``words=None``.
    ``'auto'`` counts the already-materialized checkpoint — a
    vocab-sized job, not a corpus scan — and the winning arm consumes
    that same frame."""
    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "driver":
        pdf = word_freqs(df, text_col).toPandas()
        return list(zip(pdf["word"], pdf["freq"])), None
    par = df.sparkSession.sparkContext.defaultParallelism
    if mode == "distributed":
        return None, round_checkpoint(
            word_freqs(df, text_col).repartition(par), checkpoint_dir
        )
    # auto: materialize into CACHE for the dispatch count, so the
    # driver arm can collect from it and release — checkpointing
    # before the decision would leave orphaned localCheckpoint blocks
    # (or reliable-checkpoint files) pinned whenever the driver arm
    # wins (round-15 review); the distributed arm checkpoints FROM the
    # cache, then the cache is dropped either way.
    wf = word_freqs(df, text_col).persist()
    if wf.count() <= _DRIVER_EM_MAX_VOCAB:
        pdf = wf.toPandas()
        wf.unpersist(blocking=False)
        return list(zip(pdf["word"], pdf["freq"])), None
    wfc = round_checkpoint(wf.repartition(par), checkpoint_dir)
    wf.unpersist(blocking=False)
    return None, wfc


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    min_freq: int = 2,
    max_seed: int = 200,
    vocab_size: int = 120,
    em_iters: int = 3,
    checkpoint_dir: str | None = None,
    mode: str = "auto",
) -> dict[str, int]:
    """Train the unigram piece inventory (module docstring). Returns
    the final ``piece -> count`` table in driver space — the tokenizer
    artifact, like BPE's rule list (vocab-sized by construction; the
    corpus never leaves the cluster in distributed mode).

    ``mode='driver'`` collects the (word, freq) frame once and runs
    every EM round in plain Python with the SAME Viterbi kernel the
    Arrow UDF ships (integer count sums are orderless, so the learned
    table is identical — equality pytest); ``'auto'`` picks by the
    measured latency/compute crossover (``_DRIVER_EM_MAX_VOCAB``).
    ``checkpoint_dir`` is meaningful only for the distributed rounds."""
    spark = df.sparkSession
    counts = {
        r.piece: int(r.piece_freq)
        for r in seed_vocab(
            df, text_col, max_piece_len, min_freq, max_seed
        ).collect()
    }
    words, wf = _em_word_state(df, text_col, mode, checkpoint_dir)
    for _ in range(em_iters):
        if words is not None:
            seg = _viterbi_factory(_smoothed_logp(counts), max_piece_len)
            new: dict[str, int] = {}
            for w, f in words:
                ps = seg(w)
                if ps:
                    f = int(f)
                    for p in ps:
                        new[p] = new.get(p, 0) + f
        else:
            seg_udf = _segment_udf(_smoothed_logp(counts), max_piece_len)
            used = (
                wf.withColumn("pieces", seg_udf(F.col("word")))
                .select("freq", F.explode("pieces").alias("piece"))
                .groupBy("piece")
                .agg(F.sum("freq").alias("cnt"))
                .collect()
            )
            new = {r.piece: int(r.cnt) for r in used}
        # closure: single chars survive at count 0; longer unused
        # pieces are pruned
        for p in counts:
            if len(p) == 1 and p not in new:
                new[p] = 0
        counts = new
    # final prune: top vocab_size by (count DESC, piece), chars always
    kept = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    final = dict(kept[:vocab_size])
    for p, c in counts.items():
        if len(p) == 1:
            final[p] = c
    if wf is not None:
        wf.unpersist(blocking=False)
    return final


def vocab_df(spark, counts: dict[str, int]) -> DataFrame:
    """The trained inventory as a frame — the catalog/bench surface:
    (piece, cnt), deterministic content."""
    rows = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return spark.createDataFrame(
        [(p, c) for p, c in rows], "piece string, cnt long"
    )


def unigram_encode(
    df: DataFrame,
    counts: dict[str, int],
    max_piece_len: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode documents with a trained inventory: (id, n_words,
    n_pieces, pieces), ``pieces`` the space-joined Viterbi piece
    sequence (word-internal, word order preserved). Same
    distinct-word collapse and single-reassembly-shuffle shape as
    :func:`.bpe.bpe_encode`. Words containing characters outside the
    inventory keep a null pieces slot and are dropped from the piece
    stream (counted in ``n_oov_words``)."""
    seg = _segment_udf(_smoothed_logp(counts), max_piece_len)
    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias("pos", "word"),
    ).where(F.length("word") > 0)
    distinct_words = words.select("word").distinct()
    pieces = distinct_words.withColumn("pieces", seg(F.col("word")))
    encoded = words.join(pieces, "word")
    return (
        encoded.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.filter(
                        F.sort_array(
                            F.collect_list(F.struct("pos", "pieces"))
                        ),
                        lambda x: x.getField("pieces").isNotNull(),
                    ),
                    lambda x: x.getField("pieces"),
                )
            ).alias("piece_arr"),
            F.count(F.lit(1)).alias("n_words"),
            F.sum(
                F.when(F.col("pieces").isNull(), 1).otherwise(0)
            ).alias("n_oov_words"),
        )
        .select(
            F.col(id_col),
            F.col("n_words"),
            F.col("n_oov_words"),
            F.size("piece_arr").alias("n_pieces"),
            F.concat_ws(" ", "piece_arr").alias("pieces"),
        )
    )


def unigram_save_vocab(spark, counts: dict[str, int], path: str) -> None:
    """Persist the trained inventory as the tokenizer artifact at
    rest (the few-KB file that ships with a model release);
    round-trips through :func:`unigram_load_vocab`."""
    vocab_df(spark, counts).coalesce(1).write.mode("overwrite").parquet(
        path
    )


def unigram_load_vocab(spark, path: str) -> dict[str, int]:
    rows = spark.read.parquet(path).collect()
    return {r.piece: int(r.cnt) for r in rows}


# --- full EM (forward-backward expected counts) ----------------------------
#
# The hard-EM trainer above counts pieces along the single Viterbi
# path; SentencePiece's actual E-step credits EVERY segmentation,
# weighted by posterior probability (forward-backward over the word
# lattice). Expected counts are floats — and a float SUM across a
# cluster is partition-order dependent — so determinism is engineered
# back in two steps: (1) the per-word forward-backward runs in plain
# Python floats with a SPEC-PINNED operation order (positions
# ascending, piece lengths ascending — any conforming implementation
# reproduces it bit-for-bit, which tests/test_unigram.py's independent
# reference does), and (2) each word's contribution quantizes to
# integer micro-counts (round(c · 10⁶)) BEFORE aggregation, so the
# cluster-wide sum is exact integer arithmetic — the dsum/DECIMAL
# idiom applied to EM statistics. The trained table is therefore
# bit-identical on any partitioning.

EM_SCALE = 1_000_000


def _expected_piece_counts(
    word: str, probs: dict[str, float], max_piece_len: int
) -> list[tuple[str, float]] | None:
    """Forward-backward posteriors over the segmentation lattice of
    one word. Returns (piece, expected_count) pairs in first-seen
    order, or None if the word is unsegmentable. Operation order is
    part of the spec (module comment): alpha by position ascending /
    length ascending; beta by position descending / length ascending;
    posterior accumulation by position ascending / length ascending."""
    n = len(word)
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for i in range(1, n + 1):
        for l in range(1, min(max_piece_len, i) + 1):
            p = probs.get(word[i - l : i])
            if p is not None and alpha[i - l] > 0.0:
                alpha[i] += alpha[i - l] * p
    z = alpha[n]
    if z == 0.0:
        return None
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for i in range(n - 1, -1, -1):
        for l in range(1, min(max_piece_len, n - i) + 1):
            p = probs.get(word[i : i + l])
            if p is not None and beta[i + l] > 0.0:
                beta[i] += p * beta[i + l]
    counts: dict[str, float] = {}
    for i in range(1, n + 1):
        for l in range(1, min(max_piece_len, i) + 1):
            piece = word[i - l : i]
            p = probs.get(piece)
            if p is not None and alpha[i - l] > 0.0 and beta[i] > 0.0:
                counts[piece] = (
                    counts.get(piece, 0.0) + alpha[i - l] * p * beta[i] / z
                )
    return list(counts.items())


def _em_probs(scaled: dict[str, int]) -> dict[str, float]:
    """Laplace smoothing in scaled units: p = (c + S)/(total + V·S)
    with S = EM_SCALE — one pseudo-occurrence per piece, expressed in
    micro-counts."""
    total = sum(scaled.values())
    v = len(scaled)
    return {
        p: (c + EM_SCALE) / (total + v * EM_SCALE)
        for p, c in scaled.items()
    }


def _em_count_udf(probs: dict[str, float], max_piece_len: int):
    def em_batch(words):
        def one(word):
            got = _expected_piece_counts(word, probs, max_piece_len)
            if got is None:
                return None
            return [
                {"piece": p, "c": int(round(c * EM_SCALE))}
                for p, c in got
            ]

        return words.map(one)

    return F.pandas_udf(em_batch, "array<struct<piece:string,c:long>>")


def unigram_train_em(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    min_freq: int = 2,
    max_seed: int = 200,
    vocab_size: int = 120,
    em_iters: int = 3,
    checkpoint_dir: str | None = None,
    mode: str = "auto",
) -> dict[str, int]:
    """Full-EM unigram training (module comment above): per-round, an
    Arrow pass computes each DISTINCT word's expected piece counts
    (forward-backward, spec-pinned float order), quantized to integer
    micro-counts; the cluster aggregates ``Σ word_freq · micro(c)``
    exactly; the M-step renormalizes. Returns ``piece → scaled
    micro-count`` (drop-in for :func:`unigram_encode` — the smoothed
    probabilities only need relative magnitudes). The same
    word-frequency collapse and driver-bounded iteration as the
    hard-EM trainer; each round touches the vocab-sized frame only.
    ``mode``: as in :func:`unigram_train` — ``'driver'`` runs the
    rounds in plain Python over the collected vocab with the same
    kernel + quantization (identical integers, equality pytest)."""
    spark = df.sparkSession
    scaled = {
        r.piece: int(r.piece_freq) * EM_SCALE
        for r in seed_vocab(
            df, text_col, max_piece_len, min_freq, max_seed
        ).collect()
    }
    words, wf = _em_word_state(df, text_col, mode, checkpoint_dir)
    for _ in range(em_iters):
        probs = _em_probs(scaled)
        if words is not None:
            # same per-word kernel + quantization the Arrow UDF ships;
            # the weighted sums are exact integers, so the fold is
            # orderless and the result identical (equality pytest)
            new: dict[str, int] = {}
            for w, f in words:
                got = _expected_piece_counts(w, probs, max_piece_len)
                if got is None:
                    continue
                f = int(f)
                for p, c in got:
                    q = int(round(c * EM_SCALE))
                    new[p] = new.get(p, 0) + f * q
        else:
            em = _em_count_udf(probs, max_piece_len)
            used = (
                wf.withColumn("pc", em(F.col("word")))
                .select("freq", F.explode("pc").alias("e"))
                .select(
                    F.col("e.piece").alias("piece"),
                    (F.col("freq") * F.col("e.c")).alias("wc"),
                )
                .groupBy("piece")
                .agg(F.sum("wc").alias("c"))
                .collect()
            )
            new = {r.piece: int(r.c) for r in used}
        for p in scaled:
            if len(p) == 1 and p not in new:
                new[p] = 0
        scaled = new
    kept = sorted(scaled.items(), key=lambda kv: (-kv[1], kv[0]))
    final = dict(kept[:vocab_size])
    for p, c in scaled.items():
        if len(p) == 1:
            final[p] = c
    if wf is not None:
        wf.unpersist(blocking=False)
    return final


def _expected_piece_counts_fixed(
    word: str, probs: dict[str, float], max_piece_len: int
) -> list[tuple[str, int]] | None:
    """The portable twin's E-step for one word: same forward-backward
    lattice as :func:`_expected_piece_counts` (same op order — that is
    the contract the DuckDB recursive-CTE replay pins), but each
    posterior TERM is floor-quantized to integer micro-units BEFORE
    accumulation, so every downstream sum is exact integer arithmetic
    (orderless) instead of a float dict accumulation. The quantized
    term is the one fixed-shape float expression

        floor(alpha[i-l] * p * beta[i] / z * EM_SCALE)

    (left-associative, matching the SQL text in plans/unigramplans.py
    token for token)."""
    n = len(word)
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for i in range(1, n + 1):
        for l in range(1, min(max_piece_len, i) + 1):
            p = probs.get(word[i - l : i])
            if p is not None and alpha[i - l] > 0.0:
                alpha[i] += alpha[i - l] * p
    z = alpha[n]
    if z == 0.0:
        return None
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for i in range(n - 1, -1, -1):
        for l in range(1, min(max_piece_len, n - i) + 1):
            p = probs.get(word[i : i + l])
            if p is not None and beta[i + l] > 0.0:
                beta[i] += p * beta[i + l]
    counts: dict[str, int] = {}
    for i in range(1, n + 1):
        for l in range(1, min(max_piece_len, i) + 1):
            piece = word[i - l : i]
            p = probs.get(piece)
            if p is not None:
                q = int(
                    math.floor(
                        alpha[i - l] * p * beta[i] / z * EM_SCALE
                    )
                )
                counts[piece] = counts.get(piece, 0) + q
    return list(counts.items())


def _em_fixed_count_udf(probs: dict[str, float], max_piece_len: int):
    def em_batch(words):
        def one(word):
            got = _expected_piece_counts_fixed(word, probs, max_piece_len)
            if got is None:
                return None
            return [{"piece": p, "c": c} for p, c in got]

        return words.map(one)

    return F.pandas_udf(em_batch, "array<struct<piece:string,c:long>>")


def unigram_em_fixed_counts(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    min_freq: int = 2,
    max_seed: int = 200,
    em_iters: int = 2,
    checkpoint_dir: str | None = None,
    mode: str = "auto",
) -> DataFrame:
    """Portable hash-exact twin of :func:`unigram_train_em` — the
    kmeans_cluster_fixed pattern applied to the EM tokenizer trainer:
    the vocabulary is FROZEN at the seed set (no zero-count pruning,
    so the piece universe and the Laplace denominator are
    SQL-derivable each round) and the E-step quantizes each lattice
    posterior term to integer micro-units before any summation
    (:func:`_expected_piece_counts_fixed`), making the weighted
    per-round counts exact integers an external engine replays — the
    forward/backward float recurrences are fixed-order per word, so a
    DuckDB recursive CTE reproduces them bit-for-bit
    (plans/unigramplans.py unrolls ``em_iters`` rounds).

    Returns (piece, cnt): every seed piece with its round-``em_iters``
    weighted expected count (micro-units). Scale shape unchanged from
    the production trainer: one corpus shuffle (word collapse), then
    per-round one Arrow pass + one vocab-sized aggregation; the vocab
    round-trips the driver as a bounded model artifact."""
    spark = df.sparkSession
    scaled = {
        r.piece: int(r.piece_freq) * EM_SCALE
        for r in seed_vocab(
            df, text_col, max_piece_len, min_freq, max_seed
        ).collect()
    }
    vocab = sorted(scaled)
    words, wf = _em_word_state(df, text_col, mode, checkpoint_dir)
    for _ in range(em_iters):
        probs = _em_probs(scaled)
        if words is not None:
            acc: dict[str, int] = {}
            for w, f in words:
                got = _expected_piece_counts_fixed(w, probs, max_piece_len)
                if got is None:
                    continue
                f = int(f)
                for p, c in got:
                    acc[p] = acc.get(p, 0) + f * c
            used_items = acc.items()
        else:
            em = _em_fixed_count_udf(probs, max_piece_len)
            used_items = [
                (r.piece, int(r.c))
                for r in (
                    wf.withColumn("pc", em(F.col("word")))
                    .select("freq", F.explode("pc").alias("e"))
                    .select(
                        F.col("e.piece").alias("piece"),
                        (F.col("freq") * F.col("e.c")).alias("wc"),
                    )
                    .groupBy("piece")
                    .agg(F.sum("wc").alias("c"))
                    .collect()
                )
            ]
        new = {p: 0 for p in vocab}
        new.update(dict(used_items))
        scaled = new
    if wf is not None:
        wf.unpersist(blocking=False)
    return spark.createDataFrame(
        sorted(scaled.items()), "piece string, cnt bigint"
    )
