"""Corpus-curation operators for training-data pipelines: global
deterministic shuffling, token-budget selection, and per-source caps.

North-star extensions beyond the reference surface (SURVEY.md §2.9 —
the reference, `/root/reference/spark_jobs/*.py`, has no ordering or
sampling operators at all; its only row governor is the `limit(1)`
at silver_openmeteo.py:28). Global orders ride the distributed
prefix-sum primitive (:mod:`.prefix`): ONE full-data shuffle (the
range partition any global order needs), a partition-LOCAL rank or
running sum (id-decode or Arrow cumsum — never a second full-data
exchange), and a one-row-per-partition offset table broadcast back.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .prefix import ranged_cumsum, ranged_rank
from .text import token_count


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle — the example-order randomization
    step before training-batch assembly. Every row gets a
    pseudorandom but reproducible ``shuffle_key`` (md5 of the unique
    id salted with ``seed`` — md5, not xxhash64, so any engine can
    replay the permutation) and a materialized 1-based ``pos`` index
    in shuffle-key order.

    ``pos`` is a DISTRIBUTED global rank (:func:`.prefix.ranged_rank`
    — pure-JVM id-decode after the range shuffle): the only full
    shuffle is the ``repartitionByRange`` on the key, which also
    leaves the output physically laid out in shuffle order, so a
    downstream sequential reader (pack_sequences, epoch streaming)
    gets the permuted order for free without re-sorting. Changing
    ``seed`` yields an independent permutation per epoch.
    """
    key = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
    ).alias("shuffle_key")
    base = df.withColumn("shuffle_key", key)
    order = [F.col("shuffle_key"), F.col(id_col)]
    local, offsets = ranged_rank(base, order, partitions, "global_shuffle")
    return (
        local.join(
            F.broadcast(offsets.select("__pid", "__rank_offset")), "__pid"
        )
        .withColumn(
            "pos", (F.col("__local_rn") + F.col("__rank_offset")).cast("long")
        )
        .drop("__pid", "__local_rn", "__rank_offset")
    )


def token_budget_select(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "n_chars",
    budget_numer: int = 3,
    budget_denom: int = 10,
    partitions: int | None = None,
) -> DataFrame:
    """Quality-ordered token-budget selection — "keep the best
    documents until the corpus hits N tokens", the data-mixing
    primitive for fixed-token-budget pretraining runs. Documents are
    ranked by ``(score_col DESC, id)`` and kept while the running
    token total stays within ``budget_numer/budget_denom`` of the
    corpus's total tokens (integer arithmetic end-to-end, so the cut
    point is bit-identical across engines — no float budget).

    The running total is the distributed prefix sum
    (:func:`.prefix.ranged_cumsum` — per-partition window over the
    narrow (id, score, n_tokens) frame; only ~24 bytes/row ever
    shuffle, never the text), ordered by quality instead of id; the grand
    total is the sum of the per-partition totals table — one tiny
    aggregate, broadcast back with the offsets, so the budget needs
    NO second scan of the corpus. Output: kept rows with
    ``n_tokens`` and the running ``cum_tokens`` (≤ budget by
    construction).
    """
    base = df.select(
        F.col(id_col),
        F.col(score_col),
        token_count(text_col).cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    order = [F.col(score_col).desc(), F.col(id_col)]
    local, offsets = ranged_cumsum(
        base, order, partitions, "token_budget_select", value_col="n_tokens"
    )
    budget = offsets.agg(
        F.expr(
            f"(sum(__part_sum) * {int(budget_numer)})"
            f" div {int(budget_denom)}"
        )
        .cast("long")
        .alias("__budget")
    )
    return (
        local.join(
            F.broadcast(offsets.select("__pid", "__cum_offset")), "__pid"
        )
        .crossJoin(F.broadcast(budget))
        .withColumn(
            "cum_tokens",
            (F.col("__local_cum") + F.col("__cum_offset")).cast("long"),
        )
        .where(F.col("cum_tokens") <= F.col("__budget"))
        .select(id_col, score_col, "n_tokens", "cum_tokens")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str = "source",
    k: int = 10,
    order_by: list[Column] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source document cap — the anti-domination guard (a handful
    of crawl domains must not drown the mixture): keep at most ``k``
    rows per ``group_col``, best-first by ``order_by`` (default:
    ``n_chars DESC, id`` — longest first, id tiebreak).

    Pure grouped window (``row_number`` PARTITIONED BY the group) —
    no global order is needed, so this is one hash shuffle on the
    group key and scales linearly; Catalyst additionally pushes the
    ``rank <= k`` bound into the sort as a per-partition group limit.
    For adversarial single-source corpora (one group ≈ the corpus)
    pre-aggregate per-source counts and route giant sources through a
    sampled pre-filter first."""
    order = order_by or [F.col("n_chars").desc(), F.col(id_col)]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    seed: int = 42,
    shard_rows: int = 1024,
    partitions: int | None = None,
) -> None:
    """Materialize one training epoch at rest: deterministic global
    shuffle (:func:`global_shuffle`, ``seed`` = epoch) cut into
    fixed-row shards — ``shard = (pos-1) div shard_rows`` — written
    as ``shard=<k>/`` parquet partitions. Rows keep ``pos``, so a
    trainer streams shard k and sorts the ~``shard_rows`` rows in
    memory to restore the exact permuted order; resumable training
    skips consumed shards via partition PRUNING on the shard column
    (no re-scan of finished data).

    Scale notes: the shuffle's range partitioning already lays rows
    out in pos order, so each write task emits a handful of
    contiguous shards (no extra exchange for the partitionBy); file
    sizing stays with maxRecordsPerFile — no coalesce(1) (reference
    anti-pattern, SURVEY.md S6/X1). An epoch is a COMPLETE artifact,
    so the write is a full-tree crash-safe swap
    (:func:`..sources.writers.overwrite_parquet_swap`), not dynamic
    partition overwrite — dynamic overwrite only replaces TOUCHED
    shard values, so re-sharding a corpus that shrank would leave
    stale high-numbered shard dirs from the previous run feeding the
    trainer phantom data. Re-runs stay idempotent (same seed → same
    tree) and a crash never loses the previous epoch.
    """
    from ..sources.writers import overwrite_parquet_swap

    sharded = global_shuffle(df, id_col, seed, partitions).withColumn(
        "shard", F.expr(f"(pos - 1) div {int(shard_rows)}")
    )
    overwrite_parquet_swap(sharded, path, partition_by=("shard",))


def read_training_shard(spark, path: str, shard: int) -> DataFrame:
    """One shard of a :func:`write_training_shards` epoch, restored to
    exact permuted order. The shard predicate is partition pruning
    (only that directory lists/scans); the orderBy touches
    ~``shard_rows`` rows."""
    return (
        spark.read.parquet(path)
        .where(F.col("shard") == int(shard))
        .orderBy("pos")
    )


def _manifest_digest(id_col: str) -> Column:
    """Order-independent per-shard content digest: each row
    contributes a 60-bit integer derived from md5 of ``pos:id`` (the
    portable conv idiom), summed EXACTLY as DECIMAL(38,0) — any
    engine, any partitioning, same digits. Emitted as a string so the
    value survives engines without 128-bit integers."""
    h = F.expr(
        f"CAST(conv(substring(md5(concat(CAST(pos AS STRING), ':', "
        f"CAST(`{id_col}` AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    return F.sum(h.cast("decimal(38,0)")).cast("string")


def write_shard_manifest(
    spark, path: str, id_col: str = "doc_id"
) -> DataFrame:
    """Compute and persist the epoch MANIFEST from the shard tree as
    written: one row per shard with ``n_rows``, the ``[min_pos,
    max_pos]`` range, and an order-independent content digest
    (:func:`_manifest_digest`). Lands at ``path/_manifest`` — the
    underscore prefix keeps it invisible to shard-reading parquet
    scans — and returns the manifest frame.

    This is the trainer/release contract artifact: a resuming trainer
    checks counts before trusting a shard; a release audit compares
    two epochs' digests without reading data; and
    :func:`verify_epoch` recomputes it to catch lost files or a
    half-swapped tree. Cost: one column-pruned scan of
    ``(shard, pos, id)`` with map-side partial aggregation — no text
    column is read (ReadSchema shows the three columns only)."""
    m = (
        spark.read.parquet(path)
        .groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("pos").cast("long").alias("min_pos"),
            F.max("pos").cast("long").alias("max_pos"),
            _manifest_digest(id_col).alias("ids_digest"),
        )
    )
    m.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")
    return spark.read.parquet(f"{path}/_manifest")


def read_shard_manifest(spark, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/_manifest")


def verify_epoch(spark, path: str, id_col: str = "doc_id") -> DataFrame:
    """Epoch integrity check: recompute the manifest from the tree and
    return every shard whose stored and recomputed rows DISAGREE
    (missing shard, lost part-file, stale dir from a crashed swap,
    duplicated rows). Empty result == intact epoch. Columns:
    ``shard`` plus stored_*/actual_* pairs; a shard present on only
    one side reports nulls on the other."""
    stored = read_shard_manifest(spark, path)
    actual = (
        spark.read.parquet(path)
        .groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("pos").cast("long").alias("min_pos"),
            F.max("pos").cast("long").alias("max_pos"),
            _manifest_digest(id_col).alias("ids_digest"),
        )
    )
    s = stored.select(
        "shard",
        *[F.col(c).alias(f"stored_{c}") for c in
          ("n_rows", "min_pos", "max_pos", "ids_digest")],
    )
    a = actual.select(
        "shard",
        *[F.col(c).alias(f"actual_{c}") for c in
          ("n_rows", "min_pos", "max_pos", "ids_digest")],
    )
    joined = s.join(a, "shard", "full_outer")
    mismatch = None
    for c in ("n_rows", "min_pos", "max_pos", "ids_digest"):
        ne = ~F.col(f"stored_{c}").eqNullSafe(F.col(f"actual_{c}"))
        mismatch = ne if mismatch is None else (mismatch | ne)
    return joined.where(mismatch)


def quality_prune(
    df: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "n_chars",
    drop_numer: int = 1,
    drop_denom: int = 10,
    partitions: int | None = None,
) -> DataFrame:
    """Quantile pruning by GLOBAL rank — "drop the worst decile", the
    distribution-level quality cut that per-row thresholds can't
    express (the threshold IS the data's own quantile). Rows rank
    ascending by ``(score_col, id)``; the lowest
    ``drop_numer/drop_denom`` fraction is dropped by INTEGER
    arithmetic on the rank — ``keep iff rank > (n · numer) div denom``
    — so the cut point is exact on every engine (no percentile
    interpolation, whose float semantics differ across engines).

    The rank is the distributed global rank
    (:func:`.prefix.ranged_rank`) over the narrow (id, score) frame;
    n comes from the per-partition totals table — no second corpus
    scan, no single-partition window. Output keeps ``quality_rank``
    (1 = worst kept... strictly: global ascending rank) for
    downstream curriculum use.
    """
    base = df.select(F.col(id_col), F.col(score_col))
    order = [F.col(score_col), F.col(id_col)]
    local, offsets = ranged_rank(base, order, partitions, "quality_prune")
    cut = offsets.agg(
        F.expr(
            f"(sum(__part_rows) * {int(drop_numer)}) div {int(drop_denom)}"
        )
        .cast("long")
        .alias("__cut")
    )
    return (
        local.join(
            F.broadcast(offsets.select("__pid", "__rank_offset")), "__pid"
        )
        .crossJoin(F.broadcast(cut))
        .withColumn(
            "quality_rank",
            (F.col("__local_rn") + F.col("__rank_offset")).cast("long"),
        )
        .where(F.col("quality_rank") > F.col("__cut"))
        .select(id_col, score_col, "quality_rank")
    )


def interleave_sources(
    df: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic source-interleaved training order: documents are
    shuffled WITHIN each source (md5 key, reproducible), then sources
    are round-robin merged — position 1 is round 1 of the first
    source, position k cycles through every source's round-r picks
    before any round-(r+1) pick. The guarantee a plain global shuffle
    can't give: every training window samples every (surviving)
    source as evenly as the corpus allows — the batch-level mixing
    contract of a multi-source pretraining run.

    Two-level plan: a GROUPED window (hash shuffle on
    ``group_col``) assigns the within-source round ``rnd``; the
    global order over ``(rnd, group_col, id)`` is the distributed
    global rank (:func:`.prefix.ranged_rank` — range exchange +
    JVM id-decode, no single-partition window). Output adds
    ``interleave_pos`` (1-based).
    """
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col))
    base = df.withColumn("rnd", F.row_number().over(w))
    order = [F.col("rnd"), F.col(group_col), F.col(id_col)]
    local, offsets = ranged_rank(
        base, order, partitions, "interleave_sources"
    )
    return (
        local.join(
            F.broadcast(offsets.select("__pid", "__rank_offset")), "__pid"
        )
        .withColumn(
            "interleave_pos",
            (F.col("__local_rn") + F.col("__rank_offset")).cast("long"),
        )
        .drop("__pid", "__local_rn", "__rank_offset")
    )


def curate_corpus(
    df: DataFrame,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    benchmark_phrases: list[str] | None = None,
    drop_worst_numer: int = 1,
    drop_worst_denom: int = 10,
    per_source_cap: int | None = None,
    budget_numer: int | None = None,
    budget_denom: int = 10,
    seed: int = 42,
    shard_rows: int = 1024,
    partitions: int | None = None,
    score_col: str | None = None,
    near_dup_threshold: float | None = None,
    dsir_target: DataFrame | None = None,
    dsir_keep_numer: int = 1,
    dsir_keep_denom: int = 2,
    dsir_gumbel_seed: int | None = None,
    dsir_buckets: int = 4096,
    benchmark_df: DataFrame | None = None,
    decontam_frac_numer: int = 1,
    decontam_frac_denom: int = 10,
    decontam_n: int = 5,
    gopher_rules: dict | None = None,
    classifier_model: dict | None = None,
    classifier_min_score: float | None = None,
    classifier_pareto_alpha: int = 9,
    ppl_drop_bucket: str | None = None,
    ppl_k: int = 3,
    split_keep: str | None = None,
    split_pcts: list[tuple[str, int]] | None = None,
    split_salt: str = "split-v1",
) -> dict[str, int]:
    """The end-to-end training-corpus curation pipeline as ONE
    composable call — what a training-data team actually runs per
    release, in the order each stage is cheapest:

    -1. OPTIONAL split holdout (``split_keep``: keep only that
       hash-assigned split — :func:`..governance.split_corpus` with
       ``split_pcts``/``split_salt``): the release curates the
       training split while validation/test stay held out BY HASH,
       so corpus growth and re-runs never move a held-out document
       into training. Pure per-row codegen, zero shuffles — the
       cheapest gate, so it runs before everything;
    0. OPTIONAL Gopher rule gate (``gopher_rules``: a kwargs dict for
       :func:`..text.gopher_filter`, ``{}`` for the published
       defaults): the cheapest stage there is — pure per-row codegen,
       no shuffle — so it runs FIRST and every later stage pays only
       per surviving row;
    0b. OPTIONAL learned quality gate (``classifier_model``: a trained
       :mod:`.classifier` artifact dict): score every doc with the
       fastText-style model, then keep by GPT-3's Pareto lottery
       (``classifier_pareto_alpha``) or a hard ``classifier_min_score``
       threshold when one is given — the rules→labels→classifier
       production sequel to stage 0; two narrow shuffles + one
       broadcast weight join, so it still runs before the dedup
       semi-joins shuffle full content hashes;
    0c. OPTIONAL CCNet perplexity gate (``ppl_drop_bucket``: drop the
       named :func:`..text.perplexity_buckets` tile — ``"tail"`` is
       the CCNet recipe; ``ppl_k`` tiles): the corpus-LM surprisal
       ranking over the surviving pool, so "fluent" is judged against
       what the release will actually contain; docs too short to
       score have no bucket and are KEPT (short ≠ disfluent — the
       length rules own that call);
    1. exact dedup (hash semi-join — shrink first, everything after
       pays per surviving row);
    1b. OPTIONAL fuzzy dedup (``near_dup_threshold``): MinHash-LSH
       near-dup pairs (:func:`.dedup.minhash_near_duplicates`) with
       the keep-lowest-id survivor rule — exact dedup runs first so
       the LSH never pays for byte-identical copies; recall is the
       LSH S-curve (the operator's own tested contract), precision is
       exact (every drop carries a verified Jaccard ≥ threshold);
    2. eval-set decontamination — phrase-list form
       (``benchmark_phrases``: in-plan n-gram overlap, no shuffle)
       and/or corpus form (``benchmark_df``: fractional n-gram
       overlap vs the eval SUITE, :func:`..governance.
       decontaminate_against` — drop when more than
       ``decontam_frac_numer/denom`` of a doc's distinct
       ``decontam_n``-grams appear anywhere in the suite);
    2b. OPTIONAL target-matched selection (``dsir_target``): DSIR
       importance resampling (:mod:`.dsir`, arXiv:2302.03169) keeps
       the ``dsir_keep_numer/denom`` fraction most like the target
       corpus — deterministic top-fraction, or Gumbel resampling when
       ``dsir_gumbel_seed`` is set; runs after dedup/decontamination
       so weights are fit on the cleaned pool;
    3. quantile quality prune — drop the worst
       ``drop_worst_numer/denom`` by global rank
       (:func:`quality_prune`);
    4. per-source anti-domination cap (:func:`cap_per_group`,
       optional);
    5. token-budget cut (:func:`token_budget_select`, optional);
    6. deterministic global shuffle → fixed-row training shards at
       rest (:func:`write_training_shards`, ``seed`` = epoch).

    Every stage is the already-tested operator — this function adds
    ordering and plumbing only (the WeatherPipeline philosophy:
    orchestration is a parameter of the plan, not a process
    topology). Returns per-stage surviving row counts — the counts
    every curation run reports; the counting actions double as stage
    barriers, so a stage's failure surfaces at its own name.

    ``score_col`` is the quality signal for the prune and budget
    stages: default is ``n_chars`` when the input has it, else a
    derived in-plan ``length(text_col)`` (ADVICE r8 — an arbitrary
    ``curate --input`` parquet need not carry the fixture's column).
    An explicitly named ``score_col`` missing from the schema raises
    up front with the available columns, not deep inside Catalyst.

    One pass per stage (VERDICT r8): each stage's surviving frame is
    persisted (``caching.py`` group ``curate_corpus``) before its
    count, so stage k's barrier and every later stage read the cached
    frame, never re-running dedup → decontaminate → … from the scan —
    at 100 TB that was ~6 full corpus passes where ~2 suffice (one
    raw-input scan for the input count, one for dedup; everything
    after runs on shrinking cached frames). Frames release on the
    next invocation's claim or ``release_cached('curate_corpus')``.
    """
    from ..caching import claim_group, persist_into
    from .dedup import dedup_exact
    from .governance import decontaminate

    if score_col is not None and score_col not in df.columns:
        raise ValueError(
            f"curate_corpus: score_col {score_col!r} not in input "
            f"columns {df.columns}"
        )
    for c in (id_col, text_col):
        if c not in df.columns:
            raise ValueError(
                f"curate_corpus: required column {c!r} not in input "
                f"columns {df.columns}"
            )
    derived_score = False
    if score_col is None:
        if "n_chars" in df.columns:
            score_col = "n_chars"
        else:
            score_col, derived_score = "__curate_score", True
            df = df.withColumn(score_col, F.length(text_col).cast("long"))

    # Round-16 probe note: spread_small_scan at the head was tried
    # and REVERTED — the per-row gates are cheap at any corpus the
    # single-split case can even arise for, the added repartition
    # recomputes under the first two stage barriers, and the measured
    # pipeline cost went 16.0 s → 23.6 s at sf0.1 ×32. The pipeline's
    # cost lives in its contract-mandated per-stage count barriers
    # and the release write, not in gate compute.
    caches = claim_group("curate_corpus")

    def barrier(frame: DataFrame, name: str) -> DataFrame:
        frame = persist_into(caches, frame)
        counts[name] = frame.count()
        # Truncate the ANALYZED lineage before the next stage builds
        # on this frame: several stages SELF-JOIN their input (dedup's
        # anti-join, the decontamination counts, DSIR's rank), so the
        # logical plan roughly DOUBLES per stage even though the
        # persisted frame already cuts physical recompute — with the
        # full stage stack the analyzer tree OOM'd a 6 GB driver on a
        # 122-ROW corpus (measured; planning cost, not data).
        # localCheckpoint collapses the plan to a leaf; the frame is
        # materialized by the count above, so the checkpoint re-reads
        # cached partitions, and eager=False defers that to the next
        # stage's own action.
        return frame.localCheckpoint(eager=False)

    counts: dict[str, int] = {"input": df.count()}
    cur = df
    if split_keep is not None:
        from .governance import split_corpus

        cur = barrier(
            split_corpus(cur, id_col, split_pcts, split_salt)
            .where(F.col("split") == split_keep)
            .drop("split"),
            "after_split_holdout",
        )
    if gopher_rules is not None:
        from .text import gopher_filter

        flag_cols = [
            "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
            "ok_alpha_words", "ok_stopwords", "ok_dup_trigrams",
            "passes",
        ]
        cur = barrier(
            gopher_filter(cur, id_col, text_col, **gopher_rules)
            .where(F.col("passes"))
            .drop(*flag_cols),
            "after_gopher_rules",
        )
    if classifier_model is not None:
        from .classifier import (
            pareto_select,
            score_quality_classifier,
        )

        scored = score_quality_classifier(
            cur, classifier_model, id_col, text_col
        )
        if classifier_min_score is not None:
            keep = scored.where(
                F.col("score") >= float(classifier_min_score)
            )
        else:
            keep = pareto_select(
                scored, id_col, alpha=classifier_pareto_alpha
            )
        cur = barrier(
            cur.join(keep.select(id_col), id_col, "left_semi"),
            "after_classifier",
        )
    if ppl_drop_bucket is not None:
        from .text import perplexity_buckets

        doomed = (
            perplexity_buckets(cur, id_col, text_col, k=ppl_k)
            .where(F.col("bucket") == ppl_drop_bucket)
            .select(id_col)
        )
        cur = barrier(
            cur.join(doomed, id_col, "left_anti"),
            "after_perplexity_filter",
        )
    cur = barrier(dedup_exact(cur, id_col, text_col), "after_exact_dedup")
    if near_dup_threshold is not None:
        from .dedup import minhash_near_duplicates

        drops = (
            minhash_near_duplicates(
                cur, id_col, text_col, threshold=near_dup_threshold
            )
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
        cur = barrier(
            cur.join(drops, id_col, "left_anti"), "after_near_dedup"
        )
    if benchmark_phrases:
        cur = barrier(
            decontaminate(cur, benchmark_phrases, id_col, text_col),
            "after_decontaminate",
        )
    if benchmark_df is not None:
        from .governance import decontaminate_against

        cur = barrier(
            decontaminate_against(
                cur,
                benchmark_df,
                id_col,
                text_col,
                n=decontam_n,
                max_frac_numer=decontam_frac_numer,
                max_frac_denom=decontam_frac_denom,
            ).drop("n_ngrams", "n_contaminated"),
            "after_decontaminate_fraction",
        )
    if dsir_target is not None:
        from .dsir import dsir_select

        sel = dsir_select(
            cur,
            dsir_target,
            id_col,
            text_col,
            n_buckets=dsir_buckets,
            keep_numer=dsir_keep_numer,
            keep_denom=dsir_keep_denom,
            gumbel_seed=dsir_gumbel_seed,
            partitions=partitions,
        ).select(id_col)
        cur = barrier(cur.join(sel, id_col, "left_semi"), "after_dsir")
    kept = quality_prune(
        cur,
        id_col,
        score_col=score_col,
        drop_numer=drop_worst_numer,
        drop_denom=drop_worst_denom,
        partitions=partitions,
    ).select(id_col)
    cur = barrier(cur.join(kept, id_col, "left_semi"), "after_quality_prune")
    if per_source_cap is not None:
        if source_col not in df.columns:
            raise ValueError(
                f"curate_corpus: source_col {source_col!r} not in input "
                f"columns {df.columns}"
            )
        cur = barrier(
            cap_per_group(
                cur,
                source_col,
                per_source_cap,
                order_by=[F.col(score_col).desc(), F.col(id_col)],
                id_col=id_col,
            ).drop("rank"),
            "after_source_cap",
        )
    if budget_numer is not None:
        sel = token_budget_select(
            cur,
            id_col,
            text_col,
            score_col=score_col,
            budget_numer=budget_numer,
            budget_denom=budget_denom,
            partitions=partitions,
        ).select(id_col)
        cur = barrier(
            cur.join(sel, id_col, "left_semi"), "after_token_budget"
        )
    if derived_score:
        cur = cur.drop(score_col)
    write_training_shards(
        cur, out_path, id_col, seed=seed, shard_rows=shard_rows,
        partitions=partitions,
    )
    # the release contract artifact: per-shard counts/ranges/digests
    # at path/_manifest (invisible to shard scans); the sharded count
    # rides the same manifest aggregate instead of a second tree scan
    manifest = write_shard_manifest(cur.sparkSession, out_path, id_col)
    counts["sharded"] = (
        manifest.agg(F.coalesce(F.sum("n_rows"), F.lit(0))).first()[0]
    )
    return counts
