"""Corpus-governance operators for training-data pipelines: takedown
lists and eval-set decontamination.

Neither exists in the reference (its corpus is one weather document a
day); both are table-stakes for a 100 TB text pipeline:

- **takedown**: remove documents named by an external key list (DMCA /
  opt-out / license revocation), including exact duplicates of the
  listed texts that entered under different ids — a blocklist keyed by
  content fingerprint, not just by id.
- **decontamination**: remove documents that contain any n-gram from a
  benchmark/eval set, so evaluation data cannot leak into training
  (the n-gram-overlap rule used by public LM training pipelines).

Both are broadcast anti-joins — the governance side is tiny (at most
millions of keys/phrases) and the corpus side never shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import token_count, tokens


def apply_takedown(
    df: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_id_col: str = "doc_id",
) -> DataFrame:
    """Remove blocklisted documents AND exact-content duplicates of
    them: the blocklist ids resolve to content fingerprints against
    the corpus, and removal is by fingerprint — so a byte-identical
    copy of a taken-down document that entered under another id is
    removed too (takedown by content, not by bookkeeping).

    Two broadcast anti/semi joins on md5 digests; the corpus is
    scanned, never shuffled."""
    fp = df.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("__fp")
    )
    blocked_fps = (
        fp.join(
            F.broadcast(
                blocklist.select(F.col(block_id_col).alias(id_col))
            ),
            id_col,
            "left_semi",
        )
        .select("__fp")
        .distinct()
    )
    keep = fp.join(
        F.broadcast(blocked_fps), "__fp", "left_anti"
    ).select(id_col)
    return df.join(keep, id_col, "left_semi")


def ngram_phrases(text_col: str, n: int = 3, distinct: bool = True):
    """Token n-grams of a text column as SPACE-JOINED STRINGS (not
    hashes) — the oracle-comparable form. The hashed form for 100 TB
    runs is ``dedup.add_hashed_shingles``; string phrases are kept
    here because decontamination lists are human-auditable artifacts
    (you want to SEE which benchmark phrase matched).
    ``distinct=False`` keeps every occurrence — repetition metrics
    need the multiset.

    Shape note (round 17, guide §1.2 — the interpreted-HOF
    re-tokenization trap): this is a COLUMN factory, so it cannot
    materialize the token array below itself the way the DataFrame
    operators do. Instead the gram array is built by chaining
    ``zip_with`` over the n shifted slices of the token array: every
    slice is a higher-order-function ARGUMENT (evaluated once per
    row), and the lambdas reference only their own lambda variables —
    nothing re-evaluates ``split(text)`` per gram. The pre-r17
    transform form called ``element_at(split(text), i+j)`` n times
    per gram: O(n_tokens²) per document. Gram strings are identical
    (chained pairwise ``concat_ws(" ", …)`` over non-null tokens ==
    one n-ary concat_ws), so every consumer is oracle-unchanged."""
    t = tokens(text_col)
    m = F.greatest(F.size(t) - (n - 1), F.lit(0))
    grams = F.slice(t, 1, m)
    for j in range(1, n):
        # parts_j = tokens shifted by j, same length m as the chain
        grams = F.zip_with(
            grams,
            F.slice(t, 1 + j, m),
            lambda acc, x: F.concat_ws(" ", acc, x),
        )
    return F.array_distinct(grams) if distinct else grams


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
) -> DataFrame:
    """Deterministic per-stratum sampling — the training-mix
    weighting step (N% of web, all of wiki, …). A row is kept iff the
    first two hex digits of md5(id) fall below its stratum's
    threshold, so the sample is a PURE FUNCTION OF THE DATA: stable
    across partitionings, engines, cluster sizes, and re-runs —
    unlike ``df.sampleBy(seed)``, whose per-row randomness depends on
    row order. Resolution is 1/256 per stratum (two hex digits);
    strata absent from ``fractions`` are dropped (an explicit mix is
    a whitelist). One codegen filter, no shuffle."""
    if not fractions:
        raise ValueError("fractions must not be empty")
    cond = None
    for stratum, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {stratum!r} must be in [0,1]")
        n = int(round(frac * 256))
        c = F.col(strata_col) == stratum
        if n <= 0:
            continue  # 0.0: stratum fully dropped
        if n < 256:  # 256 ('100') breaks 2-char lexicographic compare
            c = c & (
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
                < F.lit(format(n, "02x"))
            )
        cond = c if cond is None else cond | c
    if cond is None:  # every stratum at 0.0 — empty mix
        return df.where(F.lit(False))
    return df.where(cond)


def decontaminate(
    df: DataFrame,
    benchmark_phrases: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Drop every document whose token ``n``-grams overlap any
    benchmark phrase (each phrase must itself be ``n`` tokens).
    ``arrays_overlap`` against the broadcast-literal phrase array is
    pure codegen — no join, no shuffle; the corpus is filtered in one
    scan. For benchmark sets too large for a literal (millions of
    phrases), explode + broadcast semi-join on hashed shingles
    instead (same shape as ``dedup.jaccard_pairs``)."""
    for p in benchmark_phrases:
        if len(p.split(" ")) != n:
            raise ValueError(
                f"benchmark phrase must be exactly {n} tokens: {p!r}"
            )
    phrases = F.array(*[F.lit(p) for p in benchmark_phrases])
    contaminated = F.arrays_overlap(ngram_phrases(text_col, n), phrases)
    return df.where(~contaminated)


def decontaminate_against(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 5,
    max_frac_numer: int = 1,
    max_frac_denom: int = 10,
) -> DataFrame:
    """Fractional n-gram decontamination against a benchmark CORPUS —
    the PaLM/GPT-3-family recipe (north-star surface; the reference
    has no governance operators): a training document is dropped when
    MORE THAN ``max_frac_numer/max_frac_denom`` of its distinct token
    ``n``-grams also appear anywhere in the benchmark suite. Unlike
    :func:`decontaminate` (any-hit whole-doc drop on a small literal
    phrase list), this takes the eval sets as a DataFrame, tolerates
    incidental single-phrase collisions, and catches paraphrase-level
    contamination where no single configured phrase is an exact hit
    but a large share of the document is.

    The threshold is an integer cross-multiplication
    (``n_contaminated · denom > numer · n_ngrams``) — no float
    boundary, bit-identical on any engine. Documents with fewer than
    ``n`` tokens have zero n-grams and are always kept. Output: the
    KEPT rows of ``df`` plus audit columns ``n_ngrams`` /
    ``n_contaminated`` (the release-report numbers).

    Scale shape: both sides explode to DISTINCT n-grams once
    (corpus-linear); the join key is the md5 DIGEST of the gram —
    16 bytes shuffle, never phrase text (the ``snapshot_diff``
    economics). Benchmark suites are eval-set-sized, so the distinct
    benchmark digest table takes a broadcast left join (flag, count);
    past the broadcast ceiling drop the hint and AQE picks the
    shuffle join. One id exchange aggregates the per-doc counts
    (map-side partials), one broadcast-able semi join keeps rows —
    the corpus text itself never shuffles."""
    grams = (
        df.select(
            F.col(id_col),
            F.explode(ngram_phrases(text_col, n)).alias("__g"),
        )
        .select(id_col, F.md5("__g").alias("__fp"))
    )
    bench_fps = (
        benchmark.select(
            F.explode(ngram_phrases(bench_text_col, n)).alias("__g")
        )
        .select(F.md5("__g").alias("__fp"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    per_doc = (
        grams.join(F.broadcast(bench_fps), "__fp", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ngrams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("n_contaminated"),
        )
    )
    flagged = df.join(per_doc, id_col, "left").select(
        *[F.col(c) for c in df.columns],
        F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
        F.coalesce("n_contaminated", F.lit(0))
        .cast("long")
        .alias("n_contaminated"),
    )
    # integer cross-multiplication; a doc with zero n-grams (shorter
    # than n tokens) trivially satisfies 0 <= 0 and is kept
    return flagged.where(
        F.col("n_contaminated") * F.lit(int(max_frac_denom))
        <= F.lit(int(max_frac_numer)) * F.col("n_ngrams")
    )


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    alpha: float = 0.5,
    target_fraction: float = 0.25,
) -> DataFrame:
    """Temperature-weighted source mixing — the pretraining data-mix
    step where per-source sampling rates are DERIVED from the corpus
    instead of hand-picked (contrast :func:`stratified_sample`'s
    explicit whitelist): source s gets share ∝ n_s^alpha (alpha<1
    upweights small sources, alpha=1 is proportional), a row quota of
    ``share_s · target_fraction · N``, and keep fraction
    ``min(1, quota_s / n_s)``. Rows are kept by the same
    pure-function-of-the-data rule as stratified_sample — an
    md5(id)-prefix threshold, here at 16-bit resolution since the
    fractions are computed, not round numbers.

    Everything is IN-PLAN: the per-source counts are a map-side-
    combinable aggregate whose result (one row per source) takes an
    unpartitioned window — safe on a source-cardinality-sized table —
    and broadcasts back onto the corpus; the corpus itself never
    shuffles. Cross-engine float parity of the thresholds, so the
    DuckDB oracle reproduces every keep decision bit-for-bit:
    alpha=0.5 routes through ``sqrt`` (IEEE correctly rounded in both
    engines — ``pow(x, 0.5)`` is not guaranteed to be) and the weight
    total is summed as DECIMAL(38,18) (order-independent), so every
    operand of the final double arithmetic is identical on both
    sides. Other alphas use ``pow`` and may differ from an oracle by
    one ulp at a threshold boundary — flagged in the docstring
    because that residual class has bitten before (see
    similarity.pairwise_topk_per_label's contract note).
    """
    from pyspark.sql import Window

    weight = (
        F.sqrt(F.col("__n"))
        if alpha == 0.5
        else F.pow(F.col("__n"), F.lit(float(alpha)))
    )
    w_all = Window.partitionBy()
    shares = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).cast("double").alias("__n"))
        .withColumn("__w", weight)
        .withColumn(
            "__sum_w",
            F.sum(F.col("__w").cast("decimal(38,18)"))
            .over(w_all)
            .cast("double"),
        )
        .withColumn(
            "__total", F.sum(F.col("__n").cast("decimal(38,0)")).over(w_all).cast("double")
        )
        .withColumn(
            "__frac",
            F.round(
                F.least(
                    F.lit(1.0),
                    (F.col("__w") / F.col("__sum_w"))
                    * F.lit(float(target_fraction))
                    * F.col("__total")
                    / F.col("__n"),
                ),
                6,
            ),
        )
    )
    j = df.join(F.broadcast(shares.select(strata_col, "__frac")), strata_col)
    thr = F.format_string(
        "%04x", F.floor(F.col("__frac") * 65536).cast("int")
    )
    keep = (F.col("__frac") >= 1.0) | (
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4) < thr
    )
    return j.where(keep).drop("__frac")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Audit diff between two corpus snapshots — the compliance
    question every dataset release answers ("what changed since the
    last cut?"): rows ``added`` (id only in new), ``removed`` (id
    only in old), ``modified`` (id in both, content fingerprint
    differs). Unchanged rows are omitted.

    One full-outer join on id over (id, md5 fingerprint) projections
    — content never shuffles, only 32-byte digests; O(corpus) with no
    skew hazard (ids are unique per side). The md5 fingerprint is the
    same external-reproducible key the takedown path uses
    (operators.text.fingerprint)."""
    from .text import fingerprint

    o = old.select(F.col(id_col), fingerprint(text_col).alias("fp_old"))
    n = new.select(F.col(id_col), fingerprint(text_col).alias("fp_new"))
    return (
        o.join(n, id_col, "full_outer")
        .withColumn(
            "change",
            F.when(F.col("fp_old").isNull(), F.lit("added"))
            .when(F.col("fp_new").isNull(), F.lit("removed"))
            .when(F.col("fp_old") != F.col("fp_new"), F.lit("modified")),
        )
        .where(F.col("change").isNotNull())
        .select(id_col, "change")
    )


def build_identity_vault(
    df: DataFrame, key_col: str, partitions: int | None = None
) -> DataFrame:
    """Identity vault bootstrap — the GDPR/CCPA pseudonymization
    pattern (north-star surface; the reference ships raw user ids
    straight to its serving table): every distinct natural key gets a
    DENSE, STABLE surrogate id ``1..n``, assigned by global rank in
    key order (deterministic: same key set → same mapping on any
    engine/partitioning). Downstream analytics join on the surrogate;
    the vault itself is the only artifact linking back, so deleting or
    restricting IT is the privacy control (takedown of a person =
    drop one vault row + the surrogate's rows, not a corpus rewrite).

    Output: ``(key_col, surrogate_id)``. Scale: distinct keys can be
    billions — the rank is the distributed prefix-sum rank (one range
    exchange of the key column only, :func:`..prefix.ranged_rank`),
    never a single-partition window."""
    from .prefix import ranged_rank

    keys = df.select(F.col(key_col)).distinct()
    order = [F.col(key_col)]
    local, offsets = ranged_rank(
        keys, order, partitions, "identity_vault"
    )
    return (
        local.join(
            F.broadcast(offsets.select("__pid", "__rank_offset")), "__pid"
        )
        .select(
            key_col,
            (F.col("__local_rn") + F.col("__rank_offset"))
            .cast("long")
            .alias("surrogate_id"),
        )
    )


def pseudonymize(
    df: DataFrame,
    vault: DataFrame,
    key_col: str,
    surrogate_col: str = "surrogate_id",
) -> DataFrame:
    """Replace the natural key column with its vault surrogate. Rows
    whose key is missing from the vault are DROPPED (inner join): an
    unmapped key leaking through as null would silently merge all
    unknown identities downstream — extend the vault first
    (:func:`vault_extend`). Join strategy is left to AQE: the vault
    is key-cardinality-sized and usually broadcastable; at
    billion-key scale it shuffles on the key both sides."""
    out_cols = [
        F.col(c) for c in df.columns if c != key_col
    ]
    return df.join(vault, key_col).select(
        F.col(surrogate_col), *out_cols
    )


def vault_write(vault: DataFrame, path: str) -> str:
    """Persist the vault with the versioned-pointer publish
    (:func:`..sources.writers.write_serving_version`): readers resolve
    a complete snapshot at every instant, and a crashed update leaves
    the previous mapping live — a half-visible vault would fork
    identities. Returns the version name."""
    from ..sources.writers import write_serving_version

    return write_serving_version(vault, path)


def vault_read(spark, path: str) -> DataFrame:
    from ..sources.writers import read_serving_table

    return read_serving_table(spark, path)


def vault_extend(
    spark,
    path: str,
    df: DataFrame,
    key_col: str,
    partitions: int | None = None,
) -> DataFrame:
    """Fold a batch's NEW keys into the persisted vault, keeping every
    existing surrogate UNCHANGED (the stability contract — a surrogate
    that ever re-mapped would corrupt every table already keyed by
    it). New keys rank after the current maximum, in key order —
    deterministic given (existing vault, new key set). Publishes the
    extended vault as the next version and returns it.

    Scale: the anti-join and the new-key rank touch only the batch's
    distinct keys; the existing vault is re-WRITTEN per update
    (snapshot consistency beats append bookkeeping for a mapping
    that must never fork) — at billion-key scale, swap the write for
    the batch-keyed append + seal pattern (:mod:`..sources.rawstore`)
    and read through its union view."""
    from .prefix import ranged_rank

    try:
        vault = vault_read(spark, path)
    except FileNotFoundError:
        vault = None
    new_keys = df.select(F.col(key_col)).distinct()
    if vault is not None:
        new_keys = new_keys.join(
            vault.select(key_col), key_col, "left_anti"
        )
        base = vault.agg(
            F.coalesce(F.max("surrogate_id"), F.lit(0)).alias("__base")
        )
    else:
        base = new_keys.sparkSession.range(1).select(
            F.lit(0).cast("long").alias("__base")
        )
    if vault is not None and not new_keys.take(1):
        # nothing new: the extend is a fixpoint — skip the republish
        # (a streaming loop would otherwise churn a vault version per
        # micro-batch); the take(1) touches only the batch's distinct
        # keys anti-joined against the vault
        return vault
    order = [F.col(key_col)]
    local, offsets = ranged_rank(
        new_keys, order, partitions, "identity_vault_extend"
    )
    fresh = (
        local.join(
            F.broadcast(offsets.select("__pid", "__rank_offset")), "__pid"
        )
        .crossJoin(F.broadcast(base))
        .select(
            key_col,
            (
                F.col("__local_rn")
                + F.col("__rank_offset")
                + F.col("__base")
            )
            .cast("long")
            .alias("surrogate_id"),
        )
    )
    out = fresh if vault is None else vault.unionByName(fresh)
    vault_write(out, path)
    return vault_read(spark, path)


def split_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: list[tuple[str, int]] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/validation/test assignment by HASH, not by
    position (north-star surface; the reference has no corpus
    splits): each row draws an integer in [0, 100) from the md5 of
    its id + salt and lands in the split whose cumulative percentage
    band covers the draw. ``splits`` is an ordered list of
    ``(name, percent)`` summing to 100 (default 98/1/1).

    Why hash, not randomSplit/position: the assignment is a PURE
    FUNCTION of (id, salt) — stable under re-runs, re-partitioning,
    corpus growth (a new document never moves an old one between
    splits — the property that keeps yesterday's held-out set held
    out), and reproducible by any engine with md5 (the catalog
    oracle replays it in DuckDB). Zero shuffles: the label is
    per-row codegen; downstream writers can partition by it.

    The draw uses the first 8 md5 hex chars mod 100 — uniform to
    ~2^-25 bias, the same arithmetic as every portable hash in this
    engine (feature_hash_embed / temperature_mix)."""
    if splits is None:
        splits = [("train", 98), ("validation", 1), ("test", 1)]
    pcts = [p for _, p in splits]
    if sum(pcts) != 100 or any(p <= 0 for p in pcts):
        raise ValueError(f"split percents must be positive and sum to 100: {splits}")
    draw = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    cum = 0
    expr = None
    for name, pct in splits:
        cum += pct
        cond = draw < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


def corpus_datasheet(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source data card — the release-documentation aggregate a
    corpus ships with (Gebru et al., "Datasheets for Datasets"):
    volume (documents, tokens, characters), exact-duplicate pressure
    (docs minus distinct texts), language spread, and the dominant
    language with its share. One map-side-combinable aggregation over
    (source) plus one over (source, lang) for the dominant-language
    pick — no corpus-sized join, every metric an exact integer (the
    token average is the repo's exact-decimal division). At 100 TB the
    datasheet costs one scan; text never shuffles (token counts are
    computed in-plan, aggregation keys are source/lang)."""
    from ..functions.exact import avg_of

    base = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(token_count(text_col)).cast("bigint").alias("n_tokens"),
        F.sum(F.length(text_col)).cast("bigint").alias("n_chars"),
        (F.count(F.lit(1)) - F.count_distinct(F.col(text_col)))
        .cast("bigint")
        .alias("n_exact_dup_docs"),
        F.count_distinct(F.col(lang_col)).cast("bigint").alias("n_langs"),
        avg_of(token_count(text_col), "avg_doc_tokens"),
    )
    from pyspark.sql import Window

    per_lang = df.groupBy(
        F.col(source_col).alias("source"), F.col(lang_col).alias("lang")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("lang_docs"))
    w = Window.partitionBy("source").orderBy(
        F.col("lang_docs").desc(), F.col("lang")
    )
    top = (
        per_lang.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select(
            "source",
            F.col("lang").alias("top_lang"),
            F.col("lang_docs").alias("top_lang_docs"),
        )
    )
    return base.join(top, "source").select(
        "source",
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_exact_dup_docs",
        "n_langs",
        "avg_doc_tokens",
        "top_lang",
        "top_lang_docs",
    )


def kanon_suppress(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity suppression: drop every row whose QUASI-IDENTIFIER
    combination (the columns an adversary could link on) is shared by
    fewer than ``k`` rows — the release gate that keeps small,
    re-identifiable groups out of a published dataset. Complements
    the identity vault (surrogates hide WHO; suppression hides rows
    whose attribute combination alone is identifying).

    One map-side-combinable count over the quasi columns plus a
    broadcast-friendly semi join of the qualifying groups back onto
    the rows — group keys shuffle, row payloads don't move until the
    final filter. Deterministic: suppression depends only on counts.

    NULL quasi-identifier values form a group like any other (the
    groupBy already treats them so): the semi join is NULL-SAFE, so a
    row whose null-combination is shared by >= k rows is kept — a
    plain equi-join would silently suppress every NULL-bearing row
    regardless of its group size."""
    import functools

    groups = (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= k)
        .select(
            *[F.col(c).alias(f"__g_{c}") for c in quasi_cols]
        )
    )
    cond = functools.reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"__g_{c}")) for c in quasi_cols],
    )
    return df.join(groups, cond, "left_semi")


def oversample_sources(
    df: DataFrame,
    weights: dict[str, tuple[int, int]],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic mixture OVERSAMPLING — the up-weighting half of
    training-mix design (GPT-3 samples Wikipedia ~3.4 epochs per pass
    while Common Crawl gets <1): each source's weight num/den may
    exceed 1, producing floor(w) full copies of every document plus
    one fractional copy kept by the md5 hash rule (the
    stratified_sample contract — a pure function of (id, copy index),
    so the epoch is reproducible on any engine or partitioning).
    Sources absent from ``weights`` pass through at weight 1.

    Output adds ``copy_id`` (0-based) so downstream shuffling/packing
    treats repeats as distinct rows while provenance stays joinable on
    the original id. One codegen explode over a per-source literal
    copy count — no shuffle, no join. Fractional resolution is 1/256
    (two md5 hex digits), matching stratified_sample."""
    if not weights:
        raise ValueError("weights must not be empty")
    full = None
    frac = None
    for src, (num, den) in weights.items():
        if num <= 0 or den <= 0:
            raise ValueError(f"weight for {src!r} must be positive")
        k = num // den
        # fractional threshold in 1/256ths, clamped below 256 so the
        # 2-hex-digit compare stays well-formed
        thresh = min(255, int(round((num % den) * 256 / den)))
        cond = F.col(source_col) == src
        fk = F.when(cond, F.lit(k))
        fr = F.when(cond, F.lit(format(thresh, "02x")))
        full = fk if full is None else F.coalesce(full, fk)
        frac = fr if frac is None else F.coalesce(frac, fr)
    full = F.coalesce(full, F.lit(1))
    frac = F.coalesce(frac, F.lit("00"))
    copies = F.filter(
        F.sequence(F.lit(0), full),
        lambda i: (i < full)
        | (
            F.substring(
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"),
                        F.lit(":"),
                        i.cast("string"),
                    )
                ),
                1,
                2,
            )
            < frac
        ),
    )
    # explode must be top-level in its projection (a generator can't
    # nest inside the cast); cast in a second step
    return df.withColumn("copy_id", F.explode(copies)).withColumn(
        "copy_id", F.col("copy_id").cast("bigint")
    )
