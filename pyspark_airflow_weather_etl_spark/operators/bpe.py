"""Distributed BPE tokenizer training and encoding.

North-star extension beyond the reference surface (SURVEY.md §2.9 —
the reference, `/root/reference/spark_jobs/*.py`, has no text
tokenization at all): the missing piece of the tokenization stack on
top of :func:`..operators.text.build_vocab` (frequency vocab) and
``encode_documents`` (id encoding) — LEARNED merge rules, the part a
pretraining pipeline actually trains (Sennrich et al. 2016,
arXiv:1508.07909).

Scale design — the classic word-frequency collapse:

- Merges never cross word boundaries, so BPE over a 100 TB corpus is
  EXACTLY BPE over its distinct-word frequency table. One corpus-sized
  shuffle (the word groupBy) collapses the input to a vocab-sized
  frame (~10⁷-10⁸ distinct words for web corpora — executor-cache
  sized), and every training iteration after that touches only the
  vocab frame, never the corpus again.
- Each iteration is: adjacent-pair counts (explode + groupBy on the
  vocab frame) → argmax to the driver (one row — the merge RULE is
  driver-state by definition, like the label-propagation loop in
  :mod:`.graph`) → in-plan merge application. The merge rewrite is a
  pure-JVM ``aggregate()`` fold over the symbol array (greedy
  leftmost, non-overlapping — ``aaa`` + (a,a) → ``[aa, a]``), no
  Python, no shuffle; ``localCheckpoint`` truncates the lineage each
  round so round N+1 never re-runs rounds 1..N.
- Production vocab sizes (32k-64k merges) make a one-rule-per-round
  driver loop slow in wall-clock rounds; the standard mitigation —
  batch the top-B non-interacting pairs per round — changes which
  rules are learned and is deliberately NOT done here: this trainer
  is the exact reference semantics, and the per-round cost is a
  vocab-frame aggregation, not a corpus pass.

Encoding reuses the same collapse: encode each DISTINCT word once
(chained merge folds on the vocab frame, k folds of O(word_len) JVM
work), broadcast/shuffle-join the word→pieces mapping back to the
corpus, and reassemble per document in word order — per-distinct-word
cost, not per-occurrence, plus ONE doc_id shuffle for reassembly.

Correctness: the merge sequence and encode output are hash-checked in
tests/test_bpe.py against a pure-Python reference implementation of
the same semantics (the catalog entries are rows-only for the driver:
an iterative argmax loop is not expressible in one DuckDB SQL query —
the initial pair-count kernel IS, and ships as the hash-exact oracle
entry ``bpe_pair_counts_documents``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.iterate import round_checkpoint

def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace pre-tokenization → (word, freq). The ONE corpus-
    sized shuffle of BPE training; everything downstream is vocab-
    sized. Deterministic and engine-portable (plain ``\\s+`` split,
    no locale-dependent normalization)."""
    return (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _chars(word: Column) -> Column:
    # split at every INTERIOR boundary only: "(?!^)" avoids a leading
    # empty string, "(?=.)" requires a following char so the zero-width
    # match at end-of-string (which Spark's limit=-1 split would keep
    # as a trailing '' symbol) never fires
    return F.split(word, r"(?!^)(?=.)")


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<left,right>> of adjacent symbol pairs (empty for
    1-symbol words). element_at is 1-based."""
    return F.when(F.size(syms) < 2, F.array().cast(
        "array<struct<left:string,right:string>>"
    )).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("left"),
                F.element_at(syms, i + 1).alias("right"),
            ),
        )
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """One BPE merge applied in-plan: greedy leftmost non-overlapping
    replacement of adjacent (left, right) with left+right, as a pure
    JVM ``aggregate`` fold carrying (emitted prefix, pending symbol).
    Tokens enter as Column literals, never spliced into SQL text, so
    corpus symbols containing quotes/backslashes are safe."""
    merged = F.lit(left + right)
    l_lit, r_lit = F.lit(left), F.lit(right)
    init = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(st: Column, s: Column) -> Column:
        acc, pend = st.getField("acc"), st.getField("pend")
        return (
            F.when(
                pend.isNull(),
                F.struct(acc.alias("acc"), s.alias("pend")),
            )
            .when(
                (pend == l_lit) & (s == r_lit),
                F.struct(
                    F.concat(acc, F.array(merged)).alias("acc"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc, F.array(pend)).alias("acc"),
                    s.alias("pend"),
                )
            )
        )

    def finish(st: Column) -> Column:
        return F.when(
            st.getField("pend").isNull(), st.getField("acc")
        ).otherwise(F.concat(st.getField("acc"), F.array(st.getField("pend"))))

    folded = F.aggregate(syms, init, step, finish)
    # rewrite only words that contain the pair — the fold is linear
    # but the common case is "pair absent", and `exists` short-circuits
    has_pair = F.when(F.size(syms) < 2, F.lit(False)).otherwise(
        F.exists(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: (F.element_at(syms, i) == l_lit)
            & (F.element_at(syms, i + 1) == r_lit),
        )
    )
    return F.when(has_pair, folded).otherwise(syms)


def _apply_merges(syms: Column, rules: list[tuple[str, str]]) -> Column:
    """A whole ordered merge BATCH applied in one expression: fold the
    rule list (as ARRAY DATA, each element a (l, r, merged) struct)
    over the symbol array, each step being the :func:`_apply_merge`
    greedy-leftmost pass against the previous step's output — exactly
    the sequential semantics.

    Why not chain ``_apply_merge`` k times: that expression references
    its input ~6×, so k-deep nesting fans out ~6^k analyzer work and
    k·depth lambda levels — 64 nested merges blow Catalyst's
    Resolution max-iterations (100), found training 512 merges at
    batch_rounds=64. Folding over the rules as data keeps the
    expression CONSTANT-size in the batch (two lambda levels total),
    so batch size is bounded by the safe-prefix proof, not by the
    analyzer."""
    rule_arr = F.array(
        *[
            F.struct(
                F.lit(l).alias("l"),
                F.lit(r).alias("r"),
                F.lit(l + r).alias("m"),
            )
            for l, r in rules
        ]
    )

    def apply_one(acc: Column, rule: Column) -> Column:
        l_lit = rule.getField("l")
        r_lit = rule.getField("r")
        merged = rule.getField("m")
        init = F.struct(
            F.array().cast("array<string>").alias("acc"),
            F.lit(None).cast("string").alias("pend"),
        )

        def step(st: Column, s: Column) -> Column:
            a, pend = st.getField("acc"), st.getField("pend")
            return (
                F.when(
                    pend.isNull(),
                    F.struct(a.alias("acc"), s.alias("pend")),
                )
                .when(
                    (pend == l_lit) & (s == r_lit),
                    F.struct(
                        F.concat(a, F.array(merged)).alias("acc"),
                        F.lit(None).cast("string").alias("pend"),
                    ),
                )
                .otherwise(
                    F.struct(
                        F.concat(a, F.array(pend)).alias("acc"),
                        s.alias("pend"),
                    )
                )
            )

        def finish(st: Column) -> Column:
            return F.when(
                st.getField("pend").isNull(), st.getField("acc")
            ).otherwise(
                F.concat(st.getField("acc"), F.array(st.getField("pend")))
            )

        folded = F.aggregate(acc, init, step, finish)
        has_pair = F.when(F.size(acc) < 2, F.lit(False)).otherwise(
            F.exists(
                F.sequence(F.lit(1), F.size(acc) - 1),
                lambda i: (F.element_at(acc, i) == l_lit)
                & (F.element_at(acc, i + 1) == r_lit),
            )
        )
        return F.when(has_pair, folded).otherwise(acc)

    return F.aggregate(rule_arr, syms, apply_one)


def _pair_counts_of(vocab: DataFrame) -> DataFrame:
    """(left, right, pair_freq) over a (freq, syms) vocab frame — the
    aggregation each full-recount round repeats and incremental mode
    runs once at iteration 0."""
    return (
        vocab.select(
            "freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p")
        )
        .groupBy(
            F.col("p.left").alias("left"), F.col("p.right").alias("right")
        )
        .agg(F.sum("freq").alias("pair_freq"))
    )


#: the round-13 measured crossover for the DISTRIBUTED trainer's two
#: recount modes (scripts/bpe_probe.py, BASELINE.md round 13):
#: driver-dict incremental recount wins where rounds are
#: per-job-LATENCY-bound (fixture-scale 1.4k words: 73.5 s vs 87.4 s
#: full at 512 merges — it deletes the recount/argmax job entirely),
#: and loses mildly at every compute-bound vocab measured (46k-2.3M
#: Zipf words: 1.09-1.23× slower — the staged delta column's write
#: amplification exceeds the recount it saves, because map-side
#: combine already shrinks the recount to pair-space size). Kept for
#: the explicit 'incremental' A/B mode; 'auto' now dispatches on
#: _DRIVER_TRAIN_MAX_VOCAB below.
_DRIVER_STATE_MAX_VOCAB = 10_000

#: 'auto' memory bound for driver-side training: above this many
#: distinct words the collected symbol lists stop being a casually
#: driver-sized artifact (2.28M measured words ≈ a few GB of Python
#: lists; 4M ≈ low-single-GB more) and the distributed trainer takes
#: over regardless of merge count.
_DRIVER_TRAIN_MAX_VOCAB = 4_000_000

#: 'auto' speed crossover (round-14 measurement, BASELINE.md): the
#: driver loop pays a vocab-proportional FIXED cost (initial pair
#: count + the early merges that touch 40-100% of words — 2.28M
#: words with the fused delta pass: ~141 s setup + 0.14 s/merge
#: tail, Arrow collect 3 s), while the distributed trainer pays
#: per-merge round cost forever (~0.95 s/merge at 2.28M words, flat
#: in merge count). They cross near num_merges ≈ vocab/13000
#: (measured: at 2.28M words driver 212.8 s at 512 merges vs
#: distributed's projected ~486 s at its measured flat 0.95 s/merge;
#: at 96 merges distributed 91.6 s beats driver's 154.9 s). 12000 is
#: the shipped, slightly-conservative constant — 'auto' goes
#: driver-side when the requested merges clear the ratio, which a
#: production 32k-vocab run does at ANY driver-collectable corpus
#: (32k × 12000 = 384M words, far past the memory bound above).
_DRIVER_TRAIN_WORDS_PER_MERGE = 12_000


def _greedy_apply(syms: list[str], left: str, right: str):
    """One greedy-leftmost non-overlapping merge pass — the
    pure-Python twin of :func:`_apply_merge` (a single pass removes
    every (left, right) adjacency: the scan consumes both symbols on
    a match, and new pairs created by a merge always involve the
    merged symbol, which cannot equal ``left``). Returns None when
    the pair does not occur — the lazy occurrence index's staleness
    check, costing nothing extra because the scan had to look
    anyway."""
    out: list[str] = []
    i, n = 0, len(syms)
    merged = left + right
    hit = False
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(merged)
            i += 2
            hit = True
        else:
            out.append(syms[i])
            i += 1
    return out if hit else None


def _bpe_train_driver(
    vocab_rows, num_merges: int, min_freq: int
) -> list["Merge"]:
    """The merge loop entirely driver-side over the collected
    (syms, freq) vocab — EXACTLY the sequential trainer's semantics
    (argmax tiebreak pair_freq DESC, left, right; greedy-leftmost
    application; min_freq stop), equality-pytested against the
    distributed trainer in tests/test_bpe.py.

    Zero Spark jobs per round (VERDICT round 13 #1): pair counts live
    in a dict, the argmax in a lazy-invalidation heap (stale entries
    — counts superseded by a later delta — are discarded on pop, so
    each round pops the TRUE current maximum), and a LAZY pair→word
    inverted index confines each merge's rewrite to the words that
    (may) contain it: per-merge cost is O(words containing the pair ×
    word length), the subword-nmt economics, instead of a cluster
    round-trip. Lazy means the index is a SUPERSET — words are added
    when a pair first appears in them and never removed; a visit to a
    word that no longer holds the pair costs one scan and is skipped
    (:func:`_greedy_apply` returns None), which profiling showed is
    far cheaper than eagerly maintaining exact sets (the eager form's
    per-word Counter pair + set discards were ~1/3 of total train
    time at 647k words). Counts are exact integers throughout — the
    signed per-word deltas are the incremental-recount semantics the
    distributed mode proved."""
    import heapq

    words: list[list[str]] = []
    freqs: list[int] = []
    for syms, f in vocab_rows:
        words.append(list(syms))
        freqs.append(int(f))
    pc: dict[tuple[str, str], int] = {}
    occ: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        f = freqs[i]
        for p in zip(syms, syms[1:]):
            pc[p] = pc.get(p, 0) + f
            occ.setdefault(p, set()).add(i)
    heap = [(-c, left, right) for (left, right), c in pc.items()]
    heapq.heapify(heap)
    merges: list[Merge] = []
    while len(merges) < num_merges and heap:
        negc, left, right = heapq.heappop(heap)
        c = -negc
        if pc.get((left, right), 0) != c:
            continue  # stale heap entry — a delta superseded it
        if c < min_freq:
            break  # fresh maximum below the floor: training is done
        merges.append(Merge(len(merges), left, right, c))
        touched: dict[tuple[str, str], int] = {}
        # pop: the pair is consumed; if a LATER merge manufactures it
        # again (its merged symbol concatenating into `left`/`right`),
        # the positive delta below re-registers both count and index
        for i in occ.pop((left, right), ()):
            old = words[i]
            new = _greedy_apply(old, left, right)
            if new is None:
                continue  # lazy-index staleness: pair already gone
            f = freqs[i]
            # fused signed delta — one dict, no Counters
            delta: dict[tuple[str, str], int] = {}
            for p in zip(old, old[1:]):
                delta[p] = delta.get(p, 0) - 1
            for p in zip(new, new[1:]):
                delta[p] = delta.get(p, 0) + 1
            for p, dc in delta.items():
                if not dc:
                    continue
                nv = pc.get(p, 0) + dc * f
                if nv:
                    pc[p] = nv
                else:
                    pc.pop(p, None)
                touched[p] = nv
                if dc > 0:
                    # a net-new occurrence in this word: (re)register.
                    # dc<0-but-still-present pairs were registered
                    # when they first appeared; dc==0 pairs likewise
                    occ.setdefault(p, set()).add(i)
            words[i] = new
        for p, nv in touched.items():
            if nv > 0:
                heapq.heappush(heap, (-nv, p[0], p[1]))
    return merges


@dataclass(frozen=True)
class _Cand:
    """A pair-count candidate row (duck-typed like the full-recount
    mode's collected Row) for :func:`_safe_batch_prefix`."""

    left: str
    right: str
    pair_freq: int


@dataclass(frozen=True)
class Merge:
    rank: int
    left: str
    right: str
    freq: int

    @property
    def merged(self) -> str:
        return self.left + self.right


def bpe_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Iteration-0 kernel as a standalone query: adjacent CHARACTER
    pair counts over the word-frequency table — the aggregation every
    training round repeats on progressively merged symbols. SQL-
    expressible, so this is the oracle-bearing catalog twin of the
    loop (``bpe_pair_counts_documents``). Output: (left, right,
    pair_freq), pair_freq = Σ word_freq × occurrences-in-word."""
    wf = word_freqs(df, text_col)
    syms = _chars(F.col("word"))
    return (
        wf.select("freq", F.explode(_adjacent_pairs(syms)).alias("p"))
        .groupBy(
            F.col("p.left").alias("left"), F.col("p.right").alias("right")
        )
        .agg(F.sum("freq").alias("pair_freq"))
    )


def _safe_batch_prefix(rows, budget: int, prior_merged: set[str]):
    """Driver-side selection for batched training: the longest prefix
    of the rank-ordered candidate list (pair_freq DESC, left, right)
    that is PROVABLY what the one-rule-per-round trainer would pick.

    Three conditions, each load-bearing for the exactness proof
    (docstring of :func:`bpe_train`):

    1. **Greedy prefix with a symbol-disjointness STOP** (stop at the
       first candidate sharing a symbol — left, right, or its merged
       concatenation — with any already-selected rule, never skip
       past it): applying a selected rule consumes only its own two
       symbols, so a later symbol-disjoint rule's count is untouched
       — and because we stopped rather than skipped, every pair
       ranked above a selected rule is itself selected, so no
       unchanged outside pair can out-rank it.
    2. **Merged-symbol novelty**: a rule whose concatenation equals a
       symbol that ALREADY exists in the vocab (the merged string of
       any earlier-learned rule) manufactures new occurrences of that
       old symbol, so counts of pairs involving it can GROW — growth
       the excluded-count bound below cannot cap. Such a rule may
       only close its batch: select it, then stop, so every
       subsequent rule re-ranks against fresh counts next round.
    3. **Strict-count guard vs the first excluded candidate**: merges
       create NEW pairs involving the (novel) merged symbol, with
       count bounded by some pre-merge pair that interacts with the
       rule — which (by the stop rule) ranks at or below the first
       excluded candidate. Requiring every kept rule's count to be
       STRICTLY above that bound means no new pair can tie or beat a
       yet-unapplied rule of the batch. The top-1 rule is exempt (it
       is the global argmax by construction).
    """
    selected = []
    used: set[str] = set()
    stop = len(rows)
    for idx, r in enumerate(rows):
        if len(selected) >= budget:
            stop = idx
            break
        concat = r.left + r.right
        if r.left in used or r.right in used or concat in used:
            stop = idx
            break
        selected.append(r)
        used.update((r.left, r.right, concat))
        if concat in prior_merged:
            stop = idx + 1
            break
    if stop < len(rows):
        excl = int(rows[stop].pair_freq)
        guarded = [r for r in selected if int(r.pair_freq) > excl]
        selected = guarded or selected[:1]
    return selected


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 30,
    min_freq: int = 2,
    batch_rounds: int = 1,
    adaptive: bool = False,
    max_batch_rounds: int = 1024,
    recount: str = "auto",
    checkpoint_dir: str | None = None,
) -> list[Merge]:
    """Learn ``num_merges`` BPE merge rules from the corpus (module
    docstring for the scale shape). Deterministic: argmax tiebreak is
    (pair_freq DESC, left ASC, right ASC); stops early when no pair
    reaches ``min_freq``. Returns the ordered rule list — driver
    state, like every trained tokenizer artifact.

    ``batch_rounds=m`` amortizes the driver round-trips that dominate
    a production 32k-merge vocab (one plan-build + one job per rule):
    each round aggregates pair counts ONCE, collects the top ``m+1``
    candidates, and applies the :func:`_safe_batch_prefix` of them in
    a single chained fold — rules selected under those two conditions
    are EXACTLY the rules the sequential trainer learns, in the same
    order with the same recorded frequencies (equality-tested against
    the sequential trainer in tests/test_bpe.py, including an
    adversarial interacting-pair corpus). Batch size only bounds how
    much is provably safe per round; correctness never depends on it.
    With ``batch_rounds=1`` the loop is the exact one-rule-per-round
    reference semantics, one candidate row per round.

    ``adaptive=True`` grows the batch as ranks decouple: deep into a
    big vocab the top of the pair ranking is dominated by
    symbol-disjoint rules, so when a round's safe prefix applies
    UN-truncated the next round asks for twice as much (capped at
    ``max_batch_rounds``), and a heavily-truncated round (under a
    quarter kept) halves it. Correctness never depends on the batch
    size — :func:`_safe_batch_prefix` proves every kept rule — so
    adaptation only moves the driver-round count; equality with the
    sequential trainer is pytest-pinned for the adaptive path too.

    ``recount`` picks how each round's pair-frequency ranking is
    produced; ALL modes learn IDENTICAL rule lists (equality
    pytest in tests/test_bpe.py):

    - ``'auto'`` (default): one vocab count dispatches —
      ``'driver'`` when the distinct-word frame fits the driver
      (≤ ``_DRIVER_TRAIN_MAX_VOCAB`` words, the memory bound) AND
      the merge count clears the measured speed crossover
      (``num_merges ≥ vocab / _DRIVER_TRAIN_WORDS_PER_MERGE`` — a
      big vocab with FEW merges amortizes the driver loop's
      vocab-proportional setup over too little work); ``'full'``
      otherwise.
    - ``'driver'`` (VERDICT round 13 #1): collect the (syms, freq)
      vocab ONCE — it is corpus-compressed, tens of MB at millions
      of words — and run the whole merge loop in
      :func:`_bpe_train_driver`: ZERO Spark jobs per round (the
      round-13 measurement proved the per-round vocab-frame
      materialization, not pair counting, bounds the distributed
      trainer's 32k-merge wall time at ~1.2-1.4 h; driver-side the
      same training is minutes). ``batch_rounds`` / ``adaptive`` are
      no-ops here (there is no per-round job to amortize), and
      ``checkpoint_dir`` only covers the one word_freqs job —
      post-collect the loop is driver state, which a Spark
      checkpoint cannot protect (persist the ARTIFACT via
      :func:`bpe_save_merges` for durability).
    - ``'incremental'``: pair counts live as DRIVER state — a dict keyed by (left, right), pair-space-sized
      like every other tokenizer artifact (distinct ADJACENT-PAIR
      count, not vocab or corpus: ~4.3e2 pairs on the 2.3M-word probe
      corpus, charset²-then-merges-bounded generally). A round is TWO
      jobs: materialize the rewritten vocab (shared with full mode),
      then collect the SIGNED pair delta of only the words whose
      symbols changed (old pairs at -freq, new at +freq, one scan,
      map-side combined to pair-space size) and fold it into the
      dict. The argmax needs NO job at all — it reads the dict. A
      merge can only change pairs inside words that contained it
      (the ``_apply_merges`` per-rule guard), so the delta is exact;
      integer counts make the fold orderless.
    - ``'full'``: re-aggregate all adjacent pairs from the vocab
      frame and TakeOrdered the top into the driver, every round —
      no driver state beyond the rule list, the A/B baseline.

    Why NOT the seemingly-scale-friendly third design (pair counts as
    a partitioned DataFrame with checkpointed per-round deltas):
    measured slower than full recount at EVERY corpus this box holds
    (1.4k-word fixture 104 s vs 79 s; 2.3M-word Zipf probe 177 s vs
    113 s at 96 merges — BASELINE.md round 13). Map-side combine
    already collapses the full recount's shuffle to pair-space size,
    so DataFrame state saves no network; it only adds a third job
    plus a state checkpoint per round. Driver-dict state keeps the
    delta's compute win and deletes both overheads.

    ``checkpoint_dir``: round-state durability
    (:func:`..functions.iterate.round_checkpoint`) — None keeps the
    fast executor-pinned localCheckpoint (an executor loss mid-train
    fails the job); a reliable path writes each round's vocab/pair
    state out so a multi-hour 32k-vocab run survives executor loss.
    Learned rules are identical either way (equality pytest).
    """
    if recount not in ("auto", "driver", "incremental", "full"):
        raise ValueError(f"unknown recount {recount!r}")
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    vocab = round_checkpoint(
        word_freqs(df, text_col)
        .withColumn("syms", _chars(F.col("word")))
        .drop("word")
        .repartition(par),
        checkpoint_dir,
    )
    if recount == "auto":
        # one cheap count over the just-materialized frame: train
        # driver-side when the vocab fits the driver (memory bound)
        # AND the requested merge count clears the measured speed
        # crossover — the driver loop's cost is vocab-proportional
        # and ~flat in merges, the distributed trainer's is
        # per-merge and ~flat in vocab (constants' rationale above)
        n_vocab = vocab.count()
        recount = (
            "driver"
            if n_vocab <= _DRIVER_TRAIN_MAX_VOCAB
            and n_vocab
            <= max(1, num_merges) * _DRIVER_TRAIN_WORDS_PER_MERGE
            else "full"
        )
    if recount == "driver":
        # Arrow transfer, not collect(): 2.4 s vs 21.4 s for the
        # 2.28M-word probe vocab (round-14 measurement)
        pdf = vocab.toPandas()
        rows = list(zip(pdf["syms"], pdf["freq"]))
        vocab.unpersist(blocking=False)
        return _bpe_train_driver(rows, num_merges, min_freq)
    pc: dict[tuple[str, str], int] | None = None
    if recount == "incremental":
        pc = {
            (r.left, r.right): int(r.pair_freq)
            for r in _pair_counts_of(vocab).collect()
        }
    import heapq

    batch = max(1, int(batch_rounds))
    mat = vocab  # the materialized frame currently backing `vocab`
    merges: list[Merge] = []
    while len(merges) < num_merges:
        want = min(batch, num_merges - len(merges))
        if pc is None:
            top = (
                _pair_counts_of(vocab)
                .where(F.col("pair_freq") >= min_freq)
                .orderBy(F.desc("pair_freq"), "left", "right")
                .limit(want + 1)
                .collect()
            )
        else:
            # argmax straight from driver state — no job at all
            top = [
                _Cand(l, r, f)
                for (l, r), f in heapq.nsmallest(
                    want + 1,
                    ((k, f) for k, f in pc.items() if f >= min_freq),
                    key=lambda t: (-t[1], t[0][0], t[0][1]),
                )
            ]
        if not top:
            break
        chosen = _safe_batch_prefix(
            top, want, {m.merged for m in merges}
        )
        for row in chosen:
            merges.append(
                Merge(len(merges), row.left, row.right, int(row.pair_freq))
            )
        rules = [(r.left, r.right) for r in chosen]
        # ONE constant-size expression applies the whole batch in
        # order (_apply_merges folds over the rules as array data) —
        # chaining _apply_merge per rule fans out ~6^k analyzer work
        # and breaks past ~16 rules (Resolution max-iterations).
        old_mat = mat
        if pc is None:
            vocab = round_checkpoint(
                vocab.withColumn(
                    "syms", _apply_merges(F.col("syms"), rules)
                ),
                checkpoint_dir,
            )
            mat = vocab
        else:
            # job 1 (shared shape with full mode): materialize the
            # rewritten vocab, carrying each CHANGED word's signed
            # pair delta alongside (old pairs at -freq, new at +freq;
            # empty for untouched words — so the checkpoint's write
            # volume is full mode's plus only the touched slice)
            signed = F.when(
                F.col("syms") != F.col("__new"),
                F.concat(
                    F.transform(
                        _adjacent_pairs(F.col("syms")),
                        lambda pr: F.struct(
                            (-F.col("freq")).alias("freq"), pr.alias("p")
                        ),
                    ),
                    F.transform(
                        _adjacent_pairs(F.col("__new")),
                        lambda pr: F.struct(
                            F.col("freq").alias("freq"), pr.alias("p")
                        ),
                    ),
                ),
            ).otherwise(
                F.array().cast(
                    "array<struct<freq:bigint,"
                    "p:struct<left:string,right:string>>>"
                )
            )
            staged = round_checkpoint(
                vocab.select(
                    "freq",
                    "syms",
                    _apply_merges(F.col("syms"), rules).alias("__new"),
                )
                .withColumn("__delta", signed)
                .drop("syms"),
                checkpoint_dir,
            )
            # job 2: fold the map-side-combined delta into the driver
            # dict — delta size is pair-space-bounded, like the dict
            delta = (
                staged.where(F.size("__delta") > 0)
                .select(F.explode("__delta").alias("sp"))
                .groupBy(
                    F.col("sp.p.left").alias("left"),
                    F.col("sp.p.right").alias("right"),
                )
                .agg(F.sum("sp.freq").alias("pair_freq"))
                .collect()
            )
            for row in delta:
                k = (row.left, row.right)
                nv = pc.get(k, 0) + int(row.pair_freq)
                if nv:
                    pc[k] = nv
                else:
                    pc.pop(k, None)
            # next round's vocab is a LAZY projection of the staged
            # checkpoint — no second materialization; the staged
            # blocks release when the following round supersedes them
            vocab = staged.select("freq", F.col("__new").alias("syms"))
            mat = staged
        old_mat.unpersist(blocking=False)
        if adaptive:
            if len(chosen) == want:
                batch = min(batch * 2, max(1, int(max_batch_rounds)))
            elif len(chosen) * 4 < want:
                batch = max(1, batch // 2)
    mat.unpersist(blocking=False)
    return merges


def merges_df(spark, merges: list[Merge]) -> DataFrame:
    """The learned rules as a frame — the catalog/bench surface:
    (merge_rank, left, right, merged, pair_freq)."""
    schema = (
        "merge_rank int, left string, right string, merged string, "
        "pair_freq long"
    )
    rows = [(m.rank, m.left, m.right, m.merged, m.freq) for m in merges]
    return spark.createDataFrame(rows, schema)


def _encode_word_udf(merges: list[Merge]):
    """Arrow-batched piece encoder over DISTINCT words. Applies the
    rule list by the standard min-rank loop: repeatedly merge the
    lowest-rank pair present (greedy leftmost within a pass) — for a
    rank-ordered rule list this is provably identical to applying
    each rule exhaustively in sequence (a merge can only create
    adjacencies involving its OWN new token, whose pairs were all
    learned at higher ranks), but costs O(len · steps) instead of
    O(len · |rules|): at a production 32k-rule vocab that factor is
    what makes encode tractable. The rule dict rides the closure —
    tokenizer artifacts are driver state, shipped once per executor.

    This is the policy-sanctioned Python path (Arrow-batched
    pandas_udf, never row-at-a-time): k chained JVM ``aggregate``
    folds express the same thing but trip the analyzer's fixed-point
    iteration limit past ~5 rules — expression-tree depth, not data,
    is the constraint."""
    ranks = {(m.left, m.right): m.rank for m in merges}
    by_rank = {m.rank: (m.left, m.right) for m in merges}

    def encode(word: str) -> list[str]:
        syms = list(word)
        while len(syms) > 1:
            best = None
            for pair in zip(syms, syms[1:]):
                r = ranks.get(pair)
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            l, r_ = by_rank[best]
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r_:
                    out.append(l + r_)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    # no type annotations: `from __future__ import annotations`
    # stringifies them and pandas_udf's signature inference rejects
    # the strings — the returnType argument alone defines the contract
    def encode_batch(words):
        return words.map(encode)

    return F.pandas_udf(encode_batch, "array<string>")


def bpe_encode(
    df: DataFrame,
    merges: list[Merge],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode documents with a learned merge list: (id, n_words,
    n_pieces, pieces) where ``pieces`` is the space-joined BPE piece
    sequence (word-internal merges only, word order preserved).

    Distinct-word collapse (module docstring): the merge loop runs
    once per DISTINCT word (:func:`_encode_word_udf`); occurrences
    get their pieces by an equi-join on the word, and documents
    reassemble with ONE doc_id shuffle (groupBy + sort_array over
    (position, pieces) — no window, no second corpus exchange)."""
    words = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), r"\s+")).alias(
                "pos", "word"
            ),
        )
        .where(F.length("word") > 0)
    )
    distinct_words = words.select("word").distinct()
    pieces = distinct_words.withColumn(
        "pieces", _encode_word_udf(merges)(F.col("word"))
    )
    encoded = words.join(pieces, "word")
    return (
        encoded.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("pos", "pieces"))
                    ),
                    lambda x: x.getField("pieces"),
                )
            ).alias("piece_arr"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .select(
            F.col(id_col),
            F.col("n_words"),
            F.size("piece_arr").alias("n_pieces"),
            F.concat_ws(" ", "piece_arr").alias("pieces"),
        )
    )


def bpe_save_merges(spark, merges: list[Merge], path: str) -> None:
    """Persist the trained rule list as the tokenizer artifact at
    rest (one small parquet — the file that ships with a model
    release; training is the expensive part, the artifact is a few
    KB). Round-trips through :func:`bpe_load_merges`."""
    merges_df(spark, merges).coalesce(1).write.mode("overwrite").parquet(path)


def bpe_load_merges(spark, path: str) -> list[Merge]:
    """Load a persisted rule list in training order — encode jobs on
    other sessions/clusters start here instead of retraining."""
    rows = spark.read.parquet(path).orderBy("merge_rank").collect()
    return [
        Merge(int(r.merge_rank), r.left, r.right, int(r.pair_freq))
        for r in rows
    ]
