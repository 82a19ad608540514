"""Text-analysis operators for training-data pipelines.

All hot-path expressions are JVM built-ins (split / transform /
aggregate / xxhash64) — no Python UDFs — so they run inside
whole-stage codegen and scale linearly with input splits. These are
north-star extensions beyond the reference surface (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import claim_group, persist_into

#: Minimal per-language stopword lists for the language-ID heuristic.
#: Real-language lists (the fixture corpus is synthetic, so the
#: heuristic honestly returns 'und' there — tests/test_text.py checks
#: detection on real sentences). Order matters: earlier language wins
#: score ties.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "it", "that", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "que", "pour", "une"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (the fixture contract: single-space
    separated). For messier corpora swap in a BPE-ish regex split."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: Column | str) -> Column:
    return F.array_size(tokens(col))


def distinct_token_ratio(col: Column | str) -> Column:
    t = tokens(col)
    return F.array_size(F.array_distinct(t)).cast("double") / F.array_size(t)


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint (md5 hex) — the exact-dedup
    key. md5 (not xxhash64) so external systems can reproduce it."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def shingles(text_col: str, n: int = 3) -> Column:
    """Token n-gram shingles as strings — the near-dup unit.

    Built from higher-order functions (sequence + transform + slice),
    so shingling never leaves the JVM. Documents shorter than ``n``
    tokens yield an empty array — guarded explicitly, because
    ``sequence(0, -1)`` *descends* in Spark rather than being empty.
    """
    return F.expr(
        f"CASE WHEN size(split({text_col}, ' ')) < {n} THEN array() "
        f"ELSE transform(sequence(0, size(split({text_col}, ' ')) - {n}), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i + 1, {n}))) END"
    )


def _scores(col: Column | str) -> dict[str, Column]:
    t = F.array_distinct(tokens(col))
    return {
        lang: F.array_size(
            F.array_intersect(t, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in STOPWORDS.items()
    }


def lang_id(col: Column | str) -> Column:
    """Stopword-overlap language ID: argmax score, 'und' if no hits.

    Ties break toward the earlier language in STOPWORDS order — the
    CASE chain checks languages in order, so the first language at the
    max score wins (the SQL oracle mirrors the same chain).
    """
    scores = _scores(col)
    mx = F.greatest(*scores.values())
    expr: Column = F.lit("und")
    for lang in reversed(list(scores)):
        expr = F.when((scores[lang] == mx) & (mx > 0), F.lit(lang)).otherwise(expr)
    return expr


def portable_shingle_hash(text_col: str, n: int = 3) -> Column:
    """Shingle hashes via md5-prefix (not xxhash64): reproducible by
    ANY system with md5 — the property a *fingerprint* needs (external
    dedup against another store), where the LSH internals are free to
    use the faster xxhash64."""
    return F.expr(
        f"transform(CASE WHEN size(split({text_col}, ' ')) < {n} THEN array() "
        f"ELSE transform(sequence(0, size(split({text_col}, ' ')) - {n}), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i + 1, {n}))) END, "
        f"s -> CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT))"
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing (MOSS) document fingerprints: the min shingle-hash of
    every sliding window of ``window`` hashes, deduplicated — the
    rolling-hash fingerprint family that guarantees any shared run of
    ≥ window+n-1 tokens yields a shared fingerprint. Pure higher-order
    functions; one explode at the end for an inverted fingerprint
    index.

    The shingle-hash array is materialized in its own projection
    first: it is referenced once per sliding window, and letting
    CollapseProject inline the md5 transform into every slice() makes
    the per-document cost quadratic (observed 11 s for 500 docs → the
    two-projection form is ~20×)."""
    from .dedup import spread_small_scan

    hashed = spread_small_scan(df).select(
        F.col(id_col), portable_shingle_hash(text_col, n).alias("__hs")
    )
    hs = F.col("__hs")
    fps = F.array_distinct(
        F.when(
            F.size(hs) >= window,
            F.transform(
                F.sequence(F.lit(0), F.size(hs) - window),
                lambda i: F.array_min(F.slice(hs, i + 1, window)),
            ),
        ).otherwise(
            F.when(F.size(hs) > 0, F.array(F.array_min(hs))).otherwise(
                F.array().cast("array<bigint>")
            )
        )
    )
    return hashed.select(
        F.col(id_col), F.explode(fps).alias("fingerprint")
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: length, token count, mean token
    length, distinct-token ratio, fingerprint — standard pre-training
    quality-filter inputs. Exact integer/ratio arithmetic only (no
    fp-summation-order hazards)."""
    # materialized token array (guide §1.2 / the cdc_chunks HOF
    # lesson): the per-token length fold runs on the interpreted HOF
    # path, so the inline-split form re-tokenized per expression
    t = F.col("__t")
    n_tok = F.array_size(t)
    return df.select(
        "doc_id", F.col(text_col), tokens(text_col).alias("__t")
    ).select(
        "doc_id",
        F.length(text_col).alias("n_chars_computed"),
        n_tok.alias("n_tokens"),
        (
            F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
            / n_tok
        ).alias("mean_token_len"),
        distinct_token_ratio(text_col).alias("distinct_ratio"),
        fingerprint(text_col).alias("fingerprint"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
) -> DataFrame:
    """Split documents into fixed-token-window chunks — the sequence-
    prep step before packing training batches: (id, chunk_idx,
    chunk_text, n_tokens), chunk_idx 1-based, last chunk ragged.

    Pure per-row codegen (token slice per chunk index + posexplode) —
    no shuffle, no Python; at 100 TB this runs at scan speed and the
    output is written straight back out partitioned however the
    packing stage wants it. Null texts produce no chunks."""
    # token array materialized one projection below (guide §1.2 /
    # the cdc_chunks HOF lesson): the transform lambda's slice
    # re-evaluates its operand per CHUNK on the interpreted HOF path,
    # so an inline split re-tokenized the document once per chunk
    t = F.col("__t")
    n_chunks = F.ceil(F.size(t) / F.lit(float(chunk_tokens))).cast("int")
    chunks = F.when(
        n_chunks >= 1,
        F.transform(
            F.sequence(F.lit(1), n_chunks),
            lambda i: F.concat_ws(
                " ", F.slice(t, (i - 1) * chunk_tokens + 1, chunk_tokens)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col), tokens(text_col).alias("__t"))
        .select(F.col(id_col), F.posexplode(chunks))
        .select(
            id_col,
            (F.col("pos") + 1).alias("chunk_idx"),
            F.col("col").alias("chunk_text"),
        )
        .withColumn("n_tokens", F.array_size(F.split("chunk_text", " ")))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    partitions: int | None = None,
) -> DataFrame:
    """Concat-and-split sequence packing — the training-batch
    assembly step after :func:`chunk_documents`: documents are laid
    end-to-end in deterministic ``id_col`` order on one global token
    axis, and that axis is cut into fixed-``budget`` bins (context
    windows). Output per kept document: ``(id, n_tokens,
    start_offset, bin_start, bin_end)`` — the bin span tells the
    materialization step which context windows the document feeds
    (a document crossing a boundary is split across bins, GPT-style
    pretraining semantics). Zero-token documents are dropped.

    Scale design — the global running total is a DISTRIBUTED PREFIX
    SUM (:func:`.prefix.ranged_cumsum`), not a single-partition
    window (a bare ``Window.orderBy(id)`` would pull 100 TB through
    one task):

    1. project down to the NARROW (id, n_tokens) frame, then
       ``repartitionByRange(id)`` — contiguous, ordered id ranges
       per partition (the sort Spark would need for any global
       order); only ~16 bytes/row ever shuffle, never the text;
    2. per-partition running totals via a window PARTITIONED BY the
       physical partition id (parallel, no cross-partition traffic;
       the ``hashpartitioning(__pid)`` re-cluster this costs moves
       only the same narrow frame — measured faster than an
       Arrow-batched per-partition cumsum, see :mod:`.prefix`);
    3. per-partition totals — one row per partition — prefix-summed
       with a window over that TINY table and broadcast back.

    The DuckDB oracle replays the same packing as one flat
    ``SUM() OVER (ORDER BY id)`` — exact equality of every offset is
    the cross-check that the distributed prefix-sum composes to the
    sequential semantics. (The cumsum is ROWS-frame by construction;
    packing requires unique ids — duplicate ids have no deterministic
    axis order.)

    The per-partition frame (``__pid`` + local cumsum) is consumed by
    TWO plan branches — the tiny totals/offsets table and the
    row-level side of the broadcast join — so :mod:`.prefix` persists
    it (:mod:`..caching` group ``pack_sequences``): both branches
    read one materialization and the partition id is assigned exactly
    once. Without the cache each branch would re-evaluate the range
    partitioning independently, and a nondeterministic upstream
    (``sample()``, round-robin ``repartition()``, task-retry input
    reordering) could assign different partition ids per branch,
    silently corrupting every global offset downstream.
    """
    from .prefix import ranged_cumsum

    base = df.select(
        F.col(id_col), token_count(text_col).alias("n_tokens")
    ).where(F.col("n_tokens") > 0)
    local, offsets = ranged_cumsum(
        base,
        [F.col(id_col)],
        partitions,
        "pack_sequences",
        value_col="n_tokens",
    )
    return (
        local.join(
            F.broadcast(offsets.select("__pid", "__cum_offset")), "__pid"
        )
        .withColumn(
            "end_offset", F.col("__local_cum") + F.col("__cum_offset")
        )
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            (F.col("end_offset") - F.col("n_tokens")).alias("start_offset"),
            F.floor(
                (F.col("end_offset") - F.col("n_tokens"))
                / F.lit(float(budget))
            ).alias("bin_start"),
            F.floor(
                (F.col("end_offset") - 1) / F.lit(float(budget))
            ).alias("bin_end"),
        )
    )


def pack_bins(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    partitions: int | None = None,
) -> DataFrame:
    """Materialize the context windows :func:`pack_sequences` plans:
    one row per bin with the assembled ``budget``-token text (last
    bin ragged) — the final emit step of the chunk → pack →
    materialize pipeline. Each document contributes one slice per
    bin it spans (computed in-plan from its global offset — pure
    codegen arithmetic, no Python), and a bin's slices are ordered
    by their global offset inside an ordered aggregation
    (collect_list → array_sort on the offset-keyed struct), so the
    output is deterministic under any partitioning. One shuffle
    (groupBy bin_id) beyond pack_sequences' machinery; slices ship
    to exactly one reducer each, so bin assembly is O(corpus), not
    O(corpus × span)."""
    packed = pack_sequences(df, id_col, text_col, budget, partitions)
    toks = df.select(F.col(id_col), tokens(text_col).alias("__tk"))
    j = packed.join(toks, id_col)
    b = F.col("p")  # struct: bin_id for one spanned bin
    pieces = j.select(
        "start_offset",
        F.explode(
            F.transform(
                F.sequence(F.col("bin_start"), F.col("bin_end")),
                lambda bin_id: F.struct(
                    bin_id.alias("bin_id"),
                    F.greatest(
                        F.lit(0).cast("long"),
                        bin_id * budget - F.col("start_offset"),
                    ).alias("s"),
                    F.least(
                        F.col("n_tokens"),
                        (bin_id + 1) * budget - F.col("start_offset"),
                    ).alias("e"),
                ),
            )
        ).alias("p"),
        F.col("__tk"),
    ).select(
        "start_offset",
        b["bin_id"].alias("bin_id"),
        (b["e"] - b["s"]).alias("piece_len"),
        F.concat_ws(
            " ", F.slice(F.col("__tk"), b["s"] + 1, b["e"] - b["s"])
        ).alias("piece"),
    )
    ordered_pieces = F.transform(
        F.array_sort(F.collect_list(F.struct("start_offset", "piece"))),
        lambda s: s["piece"],
    )
    return pieces.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("piece_len").alias("n_tokens"),
        F.concat_ws(" ", ordered_pieces).alias("bin_text"),
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    max_vocab: int = 50_000,
    partitions: int | None = None,
) -> DataFrame:
    """Build a tokenizer vocabulary: corpus token counts ranked into
    stable contiguous ids (1 = most frequent; ties break
    lexicographically) and capped at ``max_vocab`` — the
    frequency-table step every tokenizer training run starts from.

    Scale shape: the count is one explode + partial/final hash agg
    (corpus-sized input, vocab-sized output); the id assignment is a
    global rank over the VOCAB — still too big to single-partition at
    web scale (10M+ types), so it uses the distributed rank primitive
    (:func:`.prefix.ranged_rank`), never a bare ordered window. The
    cap filters AFTER ranking, so ids are the true global ranks.
    """
    from .prefix import ranged_rank

    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    order = [F.col("cnt").desc(), F.col("token")]
    local, offsets = ranged_rank(counts, order, partitions, "build_vocab")
    return (
        local.join(
            F.broadcast(offsets.select("__pid", "__rank_offset")), "__pid"
        )
        .withColumn(
            "token_id",
            (F.col("__local_rn") + F.col("__rank_offset")).cast("long"),
        )
        .where(F.col("token_id") <= max_vocab)
        .select("token", "cnt", "token_id")
    )


def encode_documents(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_id: int = 0,
) -> DataFrame:
    """Encode documents to token-id sequences with a
    :func:`build_vocab` table — the tokenize-to-ids step that turns
    the curated corpus into trainer input (vocab → encode → chunk →
    pack → shards). Output: ``(id, token_ids array<long>, n_tokens)``
    with out-of-vocabulary tokens mapped to ``oov_id``.

    Scale shape: posexplode (corpus-linear, no shuffle) → broadcast
    join on token (the vocab is ``max_vocab``-bounded; past the
    broadcast ceiling drop the hint and AQE picks a shuffle join) →
    ONE groupBy(id) shuffle for ordered reassembly
    (``array_sort`` on (pos, id) structs — deterministic under any
    partitioning, the pack_bins idiom)."""
    toks = df.select(
        F.col(id_col), F.posexplode(tokens(text_col))
    ).select(id_col, F.col("pos"), F.col("col").alias("token"))
    enc = toks.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).withColumn(
        "tid", F.coalesce(F.col("token_id"), F.lit(oov_id)).cast("long")
    )
    return (
        enc.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                lambda s: s.tid,
            ).alias("token_ids"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
        )
    )


def feature_hash_embed(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 32,
) -> DataFrame:
    """Model-free document embeddings by PORTABLE feature hashing
    (Weinberger et al. 2009): every token hashes to a bucket
    (md5-derived, any engine reproduces it) with a ±1 sign from the
    next hash bit, and the document's vector is the signed count per
    bucket — exact INTEGER arithmetic end-to-end, so the embedding is
    bit-identical on every engine and run. This bridges the text
    tables into the engine's vector operators (SRP/IVF blocking,
    cosine verify, semantic dedup) without any external model.

    Output is the UNPIVOTED form ``(id, dim_idx, value)`` with zero
    entries omitted — scalar columns only (array columns don't
    hash-compare portably), and the long-form is what a downstream
    ``groupBy(id).pivot`` or ``collect_list`` re-assembles. One
    explode + one partial/final hash agg; corpus-linear, pure
    codegen."""
    bucket = F.expr(
        "CAST(conv(substring(md5(__tok), 1, 8), 16, 10) AS BIGINT)"
        f" % {int(dim)}"
    )
    sign = F.expr(
        "CASE WHEN CAST(conv(substring(md5(__tok), 9, 1), 16, 10) AS INT)"
        " % 2 = 0 THEN 1 ELSE -1 END"
    )
    return (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__tok"))
        .select(
            F.col(id_col),
            bucket.cast("int").alias("dim_idx"),
            sign.cast("long").alias("__s"),
        )
        .groupBy(id_col, "dim_idx")
        .agg(F.sum("__s").alias("value"))
        .where(F.col("value") != 0)
    )


def dedup_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    passage_tokens: int = 32,
) -> DataFrame:
    """Corpus-wide PASSAGE-level dedup (the C4/RealNews recipe —
    Raffel et al. 2020 dedup paragraphs, Lee et al. 2021 dedup
    substrings): documents split into fixed-token passages
    (:func:`chunk_documents`), every repeated passage keeps only its
    FIRST occurrence in (doc, position) order — boilerplate headers,
    mirrored quotes, and license blocks vanish corpus-wide while the
    first copy survives — and documents reassemble from their kept
    passages in order. Documents reduced to nothing are dropped.

    Output: ``(id, clean_text, n_kept, n_dropped)``.

    Scale shape: chunking is per-row codegen; the keep-first rule is
    ONE window over the passage fingerprint (hash shuffle on the
    md5 — 32-byte keys, passage text never shuffles for the rank);
    reassembly is one groupBy(id) with an ordered aggregation
    (array_sort on chunk_idx — deterministic under any
    partitioning). Keep-first formulation A/B'd at ×64 duplication
    density (320k docs, every passage 64-plicated, 32 threads): this
    window form 1.3-1.4 s steady vs 1.6-2.0 s for a
    min(struct(doc,idx))-aggregate + join-back rewrite — realistic
    duplicate groups are small, so the rank sort is cheap and the
    rewrite's extra join dominates. The aggregate form becomes the
    right escape hatch only for MILLION-fold single-passage
    duplication (one fingerprint ≈ one task's whole input), where
    its map-side partial aggregation beats the single-group sort —
    same two-path idiom as the hot-label guard, not worth its join
    until that skew is real."""
    from pyspark.sql.window import Window

    chunks = chunk_documents(df, id_col, text_col, passage_tokens).select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk_text",
        F.md5("chunk_text").alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy(id_col, "chunk_idx")
    kept = chunks.withColumn("rn", F.row_number().over(w))
    per_doc = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") == 1,
                            F.struct("chunk_idx", "chunk_text"),
                        )
                    )
                ),
                lambda s: s.chunk_text,
            ),
            " ",
        ).alias("clean_text"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dropped"),
    )
    return per_doc.where(F.col("n_kept") > 0)


def remove_frequent_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    passage_tokens: int = 32,
    min_docs: int = 2,
) -> DataFrame:
    """C4's boilerplate SUPPRESSION rule (Raffel et al. 2020: "we
    discarded any line that occurred in three or more documents"),
    passage-windowed for the fixture's line-less corpus: a passage
    whose fingerprint appears in ``min_docs`` OR MORE DISTINCT
    documents is removed from EVERY document (unlike
    :func:`dedup_passages`, which keeps the first copy — suppression
    is the right rule for navigation chrome / license blocks, where
    even one surviving copy per mirror family is noise). Documents
    reassemble from their surviving passages in order; emptied
    documents drop. Output matches :func:`dedup_passages`:
    ``(id, clean_text, n_kept, n_dropped)``.

    Scale shape: chunking is per-row codegen; the document-frequency
    table aggregates 16-byte digests with partial aggregation
    (``count(distinct id)`` per fp — two-stage expand/agg, linear in
    passages); the suppression is a LEFT ANTI join of the chunk frame
    against the (small — boilerplate is by definition the repeated
    minority) frequent-fingerprint set, broadcast under AQE; then one
    ordered reassembly aggregation. Fingerprints shuffle, passage
    text never re-shuffles for the frequency side."""
    chunks = chunk_documents(df, id_col, text_col, passage_tokens).select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk_text",
        F.md5("chunk_text").alias("fp"),
    )
    frequent = (
        chunks.groupBy("fp")
        .agg(F.count_distinct(F.col(id_col)).alias("df"))
        .where(F.col("df") >= int(min_docs))
        .select("fp")
    )
    kept = chunks.join(frequent, "fp", "left_anti")
    n_chunks = chunks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("__n_total")
    )
    per_doc = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk_text"))
                ),
                lambda s: s.chunk_text,
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    return (
        per_doc.join(n_chunks, id_col)
        .select(
            F.col(id_col),
            "clean_text",
            "n_kept",
            (F.col("__n_total") - F.col("n_kept")).alias("n_dropped"),
        )
        .where(F.col("n_kept") > 0)
    )


def dedup_substrings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 32,
    stride: int = 16,
) -> DataFrame:
    """STRIDED-window substring dedup — the overlapping-window
    refinement of :func:`dedup_passages` (closer to Lee et al. 2021's
    suffix-array substring dedup, arXiv:2107.06499): fingerprint every
    ``window_tokens``-token window starting at token positions
    1, 1+stride, 1+2·stride, … (full windows only — a doc shorter
    than one window passes through untouched), keep each repeated
    window's FIRST occurrence in (doc, start) order, and remove the
    TOKEN RANGES of every later occurrence. Because windows overlap
    (stride < window), a duplicated span that straddles a fixed
    passage boundary — invisible to ``dedup_passages``, whose
    disjoint chunks hash differently on each side of the cut — still
    contains a fully-duplicated window at the same token alignment
    and is caught (the boundary-straddling pytest in
    tests/test_text.py is exactly the case the passage entry misses).

    Removal is conservative at token granularity: a token inside ANY
    non-first duplicated window is removed, even if it also belongs
    to a first-occurrence window (Lee et al. likewise cut every later
    copy of a duplicated span). Output:
    ``(id, clean_text, n_kept_tokens, n_dropped_tokens)``; documents
    reduced to nothing are dropped.

    Scale shape — three linear passes, no quadratic term anywhere:
    (1) window fingerprints are per-row codegen (token slice + md5)
    exploded ~n_tokens/stride per doc; the keep-first rule shuffles
    ONLY 32-byte fingerprints + (doc, start) — window text never
    shuffles (it is re-derivable and not carried); (2) dropped token
    positions explode from non-first windows only (duplication-
    proportional, not corpus-proportional); (3) reassembly explodes
    the token axis once (~n_tokens rows of small ints — the same
    order of work as Lee et al.'s suffix array construction), anti-
    joins the dropped (doc, pos) set, and re-aggregates in position
    order. At 100 TB: stride is the cost dial (windows per token =
    1/stride), and the token-axis explode is the dominant term —
    partition by doc id and it stays embarrassingly parallel."""
    from pyspark.sql.window import Window

    from .dedup import spread_small_scan

    # fixture-sized inputs read as ONE split; the window fingerprint
    # explode + md5 below is per-row codegen with no exchange before
    # it, so left unspread it runs on a single core (guarded no-op on
    # many-split deployments — round 16, guide §2.5 input skew)
    # token array materialized one projection below (round 17, guide
    # §1.2 / the cdc_chunks HOF lesson): the window-fingerprint select
    # used to carry the raw text through the explode and re-split it
    # PER WINDOW ROW for each slice; now each window slices the
    # already-computed array attribute
    df = spread_small_scan(df).select(
        F.col(id_col), tokens(text_col).alias("__t")
    )
    t = F.col("__t")
    n = F.size(t)
    starts = F.when(
        n >= window_tokens,
        F.sequence(
            F.lit(1),
            n - F.lit(window_tokens) + 1,
            F.lit(stride),
        ),
    ).otherwise(F.array().cast("array<int>"))
    wins = df.select(
        F.col(id_col),
        t,
        F.explode(starts).alias("start"),
    ).select(
        F.col(id_col),
        F.col("start").cast("long").alias("start"),
        F.md5(
            F.concat_ws(
                " ", F.slice(t, F.col("start"), window_tokens)
            )
        ).alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy(id_col, "start")
    dup_wins = (
        wins.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .select(id_col, "start")
    )
    dropped_pos = dup_wins.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.col("start"), F.col("start") + F.lit(window_tokens - 1)
            )
        ).alias("pos"),
    ).distinct()
    tok = df.select(
        F.col(id_col), F.posexplode(t).alias("pos0", "tok")
    ).select(
        F.col(id_col), (F.col("pos0") + 1).cast("long").alias("pos"), "tok"
    )
    kept_tok = tok.join(dropped_pos, [id_col, "pos"], "left_anti")
    n_tok = df.select(F.col(id_col), n.cast("long").alias("n_tokens"))
    per_doc = (
        kept_tok.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s.tok,
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_kept_tokens"),
        )
        .join(n_tok, id_col)
        .select(
            F.col(id_col),
            "clean_text",
            "n_kept_tokens",
            (F.col("n_tokens") - F.col("n_kept_tokens")).alias(
                "n_dropped_tokens"
            ),
        )
    )
    return per_doc.where(F.col("n_kept_tokens") > 0)


def _bigram_pairs(t: Column) -> Column:
    """Adjacent (w1, w2) struct array over a MATERIALIZED token-array
    column. ``t`` MUST be an attribute (a ``tokens(...)`` expression
    projected one level below), never an inline ``split()``: the
    transform lambda's ``element_at(t, ...)`` re-evaluates its operand
    per ELEMENT on the interpreted higher-order-function path (no
    codegen subexpression elimination there), so an inline split
    re-tokenizes the whole document twice per bigram — O(n²) per doc
    (round 17, guide §1.2; the span_corruption "cdc_chunks HOF
    lesson", applied to the three bigram builders that predate it)."""
    return F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: F.struct(
                F.element_at(t, i + 1).alias("w1"),
                F.element_at(t, i + 2).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


def lm_bigram_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-statistics language-model quality score per document —
    the CCNet-style "how surprising is this document under a model of
    the corpus" signal, with the corpus itself as the model (no
    external LM artifact; north-star extension, no reference file).

    The model is the maximum-likelihood bigram LM over the whole
    input: P(w2|w1) = c(w1,w2) / c(w1·) where c(w1·) counts w1 as a
    bigram left-context. Per document:

    - ``n_bigrams``: adjacent token pairs (docs under 2 tokens: 0);
    - ``sum_bigram_freq``: Σ corpus frequency of the doc's bigrams —
      high = boilerplate-like, every phrase is common;
    - ``n_hapax_bigrams``: bigrams whose corpus frequency is 1, i.e.
      they occur nowhere outside this document — high = novel or
      noisy text (both ends of the quality spectrum are filter
      candidates; the two integer signals separate them);
    - ``avg_neg_logprob``: mean −ln P(w2|w1), the per-token surprisal
      (monotone with perplexity), rounded to 6 dp (a float-derived
      mean, the ``label_centroids`` idiom). Counts include the doc
      itself, so every probability is well-defined — no smoothing
      constant to pick, no zero-prob edge.

    Scale shape: one bigram explode of the corpus (the linear
    dominant term, persisted and reused for both the count aggregation
    and the per-doc join), count tables vocab²-bounded with map-side
    partial aggregation, then one shuffle join of the exploded frame
    back to its counts. The join keys are the (w1, w2) strings — at
    web scale, hash them to a 16-byte digest first (the
    ``decontaminate`` fingerprint idiom) to shuffle digests instead of
    text; kept as strings here for oracle portability."""
    caches = claim_group("lm_bigram_score")
    doc_bg = persist_into(
        caches,
        df.select(F.col(id_col), tokens(text_col).alias("__t"))
        .select(
            F.col(id_col),
            F.explode(_bigram_pairs(F.col("__t"))).alias("bg"),
        )
        .select(
            id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
        ),
    )
    b = doc_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    u = b.groupBy("w1").agg(F.sum("c2").alias("c1"))
    scored = (
        doc_bg.join(b, ["w1", "w2"])
        .join(u, ["w1"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("c2").alias("sum_bigram_freq"),
            F.sum(F.when(F.col("c2") == 1, 1).otherwise(0)).alias(
                "n_hapax_bigrams"
            ),
            F.round(
                F.avg(
                    F.log(F.col("c1").cast("double"))
                    - F.log(F.col("c2").cast("double"))
                ),
                6,
            ).alias("avg_neg_logprob"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("sum_bigram_freq", F.lit(0))
            .cast("long")
            .alias("sum_bigram_freq"),
            F.coalesce("n_hapax_bigrams", F.lit(0))
            .cast("long")
            .alias("n_hapax_bigrams"),
            F.col("avg_neg_logprob"),
        )
    )


def bigram_lm_train(
    reference: DataFrame, text_col: str = "text"
) -> dict:
    """Train the frozen reference bigram LM — CCNet's actual design
    (Wenzek et al. 2020 score crawl text under a WIKIPEDIA-trained
    LM, not the corpus's own statistics): returns ``{"b": (w1, w2,
    c2), "u": (w1, c1), "vocab": V}`` with V = the reference's
    distinct-successor count, the Laplace denominator. The count
    tables are vocab²-bounded DataFrames (map-side partial
    aggregation; at web scale hash the words to digests first — kept
    as strings here for oracle portability, the
    :func:`lm_bigram_score` note)."""
    bg = (
        reference.select(tokens(text_col).alias("__t"))
        .select(F.explode(_bigram_pairs(F.col("__t"))).alias("bg"))
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    b = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    u = b.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = b.select("w2").distinct().count()
    return {"b": b, "u": u, "vocab": int(vocab)}


def bigram_lm_save(model: dict, path: str) -> None:
    """Persist the frozen LM artifact (count tables + one-row meta —
    the tokenizer-artifact layout)."""
    spark = model["b"].sparkSession
    model["b"].write.mode("overwrite").parquet(f"{path}/bigrams")
    model["u"].write.mode("overwrite").parquet(f"{path}/contexts")
    spark.createDataFrame(
        [(int(model["vocab"]),)], "vocab int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def bigram_lm_load(spark, path: str) -> dict:
    return {
        "b": spark.read.schema("w1 string, w2 string, c2 bigint").parquet(
            f"{path}/bigrams"
        ),
        "u": spark.read.schema("w1 string, c1 bigint").parquet(
            f"{path}/contexts"
        ),
        "vocab": int(
            spark.read.schema("vocab int")
            .parquet(f"{path}/meta")
            .collect()[0]["vocab"]
        ),
    }


def lm_bigram_score_against(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents under a FROZEN reference bigram LM
    (:func:`bigram_lm_train` artifact) — the CCNet deployment shape:
    the model is trained once on a reference corpus and every pool
    (or every arriving batch — :mod:`...streaming.lm_monitor`) scores
    against the same artifact. Laplace-smoothed so out-of-reference
    bigrams are defined: −ln P(w2|w1) = ln(c1+V) − ln(c2+1), all
    integers into the logs, per-doc mean rounded to 6 dp (the
    ``avg_neg_logprob`` idiom — exact cross-engine given the same
    counts). Output: ``(id, n_bigrams, n_oov_bigrams,
    avg_neg_logprob)`` with n_oov = bigrams the reference never saw
    (the domain-shift signal); docs under 2 tokens score null.

    Scale shape: one pool explode; the count-table joins are LEFT
    joins (unseen pairs survive with c=0) keyed on the w1/w2 strings
    with map-side partial aggregation upstream; scoring a batch
    re-ships only the model-sized tables."""
    doc_bg = (
        df.select(F.col(id_col), tokens(text_col).alias("__t"))
        .select(
            F.col(id_col),
            F.explode(_bigram_pairs(F.col("__t"))).alias("bg"),
        )
        .select(
            id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
        )
    )
    V = int(model["vocab"])
    scored = (
        doc_bg.join(model["b"], ["w1", "w2"], "left")
        .join(model["u"], ["w1"], "left")
        .select(
            F.col(id_col),
            F.coalesce("c2", F.lit(0)).alias("c2"),
            F.coalesce("c1", F.lit(0)).alias("c1"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.when(F.col("c2") == 0, 1).otherwise(0)).alias(
                "n_oov_bigrams"
            ),
            F.round(
                F.avg(
                    F.log((F.col("c1") + F.lit(V)).cast("double"))
                    - F.log((F.col("c2") + F.lit(1)).cast("double"))
                ),
                6,
            ).alias("avg_neg_logprob"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("n_oov_bigrams", F.lit(0))
            .cast("long")
            .alias("n_oov_bigrams"),
            F.col("avg_neg_logprob"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): rank
    every document by its LM surprisal (:func:`lm_bigram_score` —
    the corpus-as-its-own-model score) and cut the ranking into ``k``
    equal tiles — head/middle/tail for k=3, CCNet's training-mix
    vocabulary (head = most fluent). Downstream mixes sample by
    bucket (keep head+middle, downweight tail) instead of a hard
    threshold.

    Documents too short to have a bigram (no defined score) are out
    of scope, as in CCNet. Output: (id, avg_neg_logprob, ppl_rank,
    bucket).

    Scale shape: the ranking is the DISTRIBUTED global rank
    (:func:`.prefix.ranged_rank` — one range exchange over the narrow
    (id, score) frame + pure-JVM id decode, no single-partition
    window); the tile boundary is exact integer arithmetic
    ``((rank-1)·k) div n`` with n from the per-partition totals table
    (no second corpus scan), so the cut is bit-identical on any
    engine — the oracle replays it with ROW_NUMBER over the same
    (score, id) total order."""
    from .prefix import ranged_rank

    scored = lm_bigram_score(df, text_col, id_col).where(
        F.col("n_bigrams") > 0
    )
    base = scored.select(F.col(id_col), "avg_neg_logprob")
    order = [F.col("avg_neg_logprob"), F.col(id_col)]
    local, offsets = ranged_rank(base, order, None, "perplexity_buckets")
    n = offsets.agg(
        F.sum("__part_rows").cast("long").alias("__n")
    )
    names = (
        ["head", "middle", "tail"]
        if k == 3
        else [f"t{i}" for i in range(int(k))]
    )
    name_arr = F.array(*[F.lit(x) for x in names])
    return (
        local.join(
            F.broadcast(offsets.select("__pid", "__rank_offset")), "__pid"
        )
        .crossJoin(F.broadcast(n))
        .withColumn(
            "ppl_rank",
            (F.col("__local_rn") + F.col("__rank_offset")).cast("long"),
        )
        .withColumn(
            "bucket",
            F.element_at(
                name_arr,
                (
                    F.expr(f"((ppl_rank - 1) * {int(k)}) div __n") + 1
                ).cast("int"),
            ),
        )
        .select(id_col, "avg_neg_logprob", "ppl_rank", "bucket")
    )


def ngram_diversity(
    df: DataFrame, text_col: str = "text", max_n: int = 3
) -> DataFrame:
    """Corpus n-gram diversity audit: for n = 1..max_n, the number of
    DISTINCT n-grams vs total n-gram occurrences — the distinct-n
    ratio (downstream divides) that quantifies corpus repetitiveness
    and template saturation (the corpus-level cousin of the per-doc
    Gopher repetition stats). One explode per n over the token-slice
    expression; exact integer output, one row per n.

    Scale: COUNT(DISTINCT) is the one heavy aggregate — Spark plans
    it as a two-stage expand/agg (partial distinct per partition),
    linear in occurrences; the approximate twin for quick audits is
    ``approx_count_distinct`` (not used here — the oracle contract is
    exact)."""
    # materialized token array (guide §1.2 / the cdc_chunks HOF
    # lesson) — the inline-split form re-tokenized once per gram slice
    t = F.col("__t")

    # closure factory, NOT `lambda i, n=n`: a two-parameter lambda is
    # Spark's (element, index) transform form, so the defaulted n
    # would silently receive the array INDEX instead of the gram size
    def _gram_maker(n: int):
        def make(i):
            return F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", F.slice(t, i, F.lit(n))).alias("gram"),
            )

        return make

    grams = F.flatten(
        F.array(
            *[
                F.when(
                    F.size(t) >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size(t) - n + 1),
                        _gram_maker(n),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<n:int,gram:string>>")
                )
                for n in range(1, max_n + 1)
            ]
        )
    )
    return (
        df.select(tokens(text_col).alias("__t"))
        .select(F.explode(grams).alias("g"))
        .select(F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
        .groupBy("n")
        .agg(
            F.countDistinct("gram").alias("n_distinct"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.col("n_total").cast("long").alias("n_total"),
        )
    )


def token_freq_spectrum(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token frequency-of-frequencies (the Zipf audit): how many
    distinct tokens occur exactly ``freq`` times. The corpus-health
    fingerprint that surfaces boilerplate floods (mass at high freq)
    and OCR/noise floods (mass at freq 1) in one vocab-sized table.
    Two chained aggregations, both partial-aggregated; exact
    integers."""
    return (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .groupBy("freq")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
        .select(
            F.col("freq").cast("long").alias("freq"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
    )


def gopher_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_symbol_per_10_words: int = 1,
    min_alpha_word_pct: int = 80,
    min_stopwords: int = 2,
    max_dup_trigram_pct: int = 30,
) -> DataFrame:
    """The Gopher quality rules (Rae et al. 2021, table A1) as ONE
    in-plan composite filter — the classic hand-tuned web-text gate
    that removes boilerplate, spam, and machine-generated sludge
    before any learned scoring. Every rule is an INTEGER
    cross-multiplication over per-row token statistics (no float
    thresholds, so the keep set is bit-identical on any engine):

    - ``ok_word_count``: ``min_words ≤ n_words ≤ max_words``;
    - ``ok_mean_word_len``: mean token length in
      ``[min_mean_word_len, max_mean_word_len]`` —
      ``min·n ≤ Σlen ≤ max·n``;
    - ``ok_symbol_ratio``: hash/ellipsis count per 10 words ≤
      ``max_symbol_per_10_words`` (the symbol-to-word rule);
    - ``ok_alpha_words``: ≥ ``min_alpha_word_pct``% of words contain
      an alphabetic character — ``100·n_alpha ≥ pct·n_words``;
    - ``ok_stopwords``: ≥ ``min_stopwords`` DISTINCT members of the
      canonical 8-stopword list appear (the "is this running
      English prose" tripwire);
    - ``ok_dup_trigrams``: duplicate-trigram fraction ≤
      ``max_dup_trigram_pct``% — ``100·(nt−nd) ≤ pct·nt`` (the
      within-doc repetition rule; corpus-wide dedup is a separate
      stage).

    Output: every input row with the six boolean flags plus
    ``passes`` (AND of all). Callers filter on ``passes`` but keep
    the flags for the release report (WHY a document died matters as
    much as that it died). Pure per-row codegen — no shuffle, no
    Python; at 100 TB this runs at scan speed.

    Round 17 (guide §1.2 per-task work): the token array is
    materialized ONCE per row in a projection BELOW the flags. Five
    of the six rules walk the array through higher-order functions
    (aggregate/filter/transform), which evaluate on the interpreted
    path where common-subexpression elimination does not apply —
    building each rule directly on ``tokens(text_col)`` re-split the
    text up to six times per row (measured ~5.8 s of the
    quality_classifier_scores entry's 6.3 s scoring sample at sf0.1).
    CollapseProject keeps the shared alias in its own projection
    because it is non-cheap and multiply-referenced (SPARK-36718).
    The flag formulas are unchanged, so the keep set is
    bit-identical (oracle-pinned by gopher_quality_filter)."""
    tcol = "__gopher_tokens"
    t = F.col(tcol)
    n_words = F.array_size(t)
    sum_len = F.aggregate(t, F.lit(0), lambda a, x: a + F.length(x))
    n_alpha = F.size(F.filter(t, lambda x: x.rlike("[a-zA-Z]")))
    stop_words = ("the", "be", "to", "of", "and", "that", "have", "with")
    # distinct-stopword count via explicit filter+distinct (NOT
    # array_intersect — its dedup semantics aren't guaranteed
    # identical across engines, and the oracle must replay exactly)
    n_stop = F.size(
        F.array_distinct(F.filter(t, lambda x: x.isin(*stop_words)))
    )
    n_symbol = (
        F.length(text_col)
        - F.length(F.replace(F.col(text_col), F.lit("#"), F.lit("")))
    ) + (
        (
            F.length(text_col)
            - F.length(
                F.replace(F.col(text_col), F.lit("..."), F.lit(""))
            )
        )
        / F.lit(3)
    ).cast("long")
    grams = F.when(
        n_words >= 3,
        F.transform(
            F.sequence(F.lit(1), n_words - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(t, i),
                F.element_at(t, i + 1),
                F.element_at(t, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    nt = F.array_size(grams)
    nd = F.array_size(F.array_distinct(grams))
    flags = {
        "ok_word_count": (n_words >= min_words)
        & (n_words <= max_words),
        "ok_mean_word_len": (
            sum_len >= F.lit(int(min_mean_word_len)) * n_words
        )
        & (sum_len <= F.lit(int(max_mean_word_len)) * n_words),
        "ok_symbol_ratio": n_symbol * 10
        <= F.lit(int(max_symbol_per_10_words)) * n_words,
        "ok_alpha_words": n_alpha * 100
        >= F.lit(int(min_alpha_word_pct)) * n_words,
        "ok_stopwords": n_stop >= F.lit(int(min_stopwords)),
        "ok_dup_trigrams": (nt - nd) * 100
        <= F.lit(int(max_dup_trigram_pct)) * nt,
    }
    out = df.withColumn(tcol, tokens(text_col))
    for name, c in flags.items():
        out = out.withColumn(name, c)
    passes = None
    for name in flags:
        passes = (
            F.col(name) if passes is None else passes & F.col(name)
        )
    return out.withColumn("passes", passes).drop(tcol)


def token_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Shannon entropy of each document's token distribution — the
    classic gibberish/boilerplate quality signal (low entropy = one
    token repeated; high = diverse vocabulary).

    H = ln(L) − (Σ_types c·ln c)/L over type counts c and length L.
    Cross-engine exactness by the retrieval-family recipe: the only
    order-sensitive float sum (over a document's types) is FROZEN
    per type to integer micro-units — round(c·ln(c)·1e6) — summed as
    exact BIGINTs, then one fixed-shape float finish. Shuffles carry
    (doc, token-type) counts, never text."""
    tok = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("t")
    )
    dl = tok.select(
        "doc_id", F.array_size("t").cast("bigint").alias("n_tokens")
    )
    c = F.col("c").cast("double")
    per_type = (
        tok.select("doc_id", F.explode("t").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            "doc_id",
            F.round(c * F.log(c) * F.lit(1000000.0), 0)
            .cast("bigint")
            .alias("term_micro"),
        )
    )
    s = per_type.groupBy("doc_id").agg(
        F.sum("term_micro").cast("bigint").alias("s_micro")
    )
    ent = (
        F.log(F.col("n_tokens").cast("double"))
        - (F.col("s_micro").cast("double") / F.lit(1000000.0))
        / F.col("n_tokens").cast("double")
    ) * F.lit(1000000.0)
    return (
        dl.join(s, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.round(ent, 0).cast("bigint").alias("entropy_micro"),
        )
    )


def span_corruption_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_len: int = 3,
    start_hex: tuple[str, ...] = ("0",),
) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020 §3.1.4) as a
    DETERMINISTIC corpus transform: positions where
    md5(id || '-' || pos) ends in ``start_hex`` begin a masked span of
    ``span_len`` tokens (P = len/16 → expected mask rate ≈
    span_len·P); overlapping spans merge. Each document yields the
    (inputs, targets) pair a denoising seq2seq trains on — masked
    spans replaced by ``<extra_id_k>`` sentinels in inputs, targets
    listing each sentinel's original tokens plus the closing
    sentinel.

    Determinism is the point: the mask is a pure function of
    (id, pos), so the pair set is reproducible across engines, runs,
    and partitionings — auditable training data, and a DuckDB oracle
    can replay it string-for-string. Per-row evaluation over
    MATERIALIZED arrays (starts → flags → span-begins; the cdc_chunks
    HOF lesson); span-index lookups scan the small begins array, so
    cost is O(L·n_spans) per doc — for book-length documents chunk
    first (chunk_documents)."""
    t = tokens(text_col)
    idc = F.col(id_col).cast("string")
    rule = lambda p: F.substring(  # noqa: E731
        F.md5(F.concat(idc, F.lit("-"), p.cast("string"))), 32, 1
    ).isin(*start_hex)
    from ..operators.dedup import spread_small_scan

    base = (
        spread_small_scan(df)
        .select(F.col(id_col), t.alias("__t"))
        .where(F.size("__t") > 0)
        .withColumn(
            "__starts",
            F.filter(F.sequence(F.lit(1), F.size("__t")), rule),
        )
        .withColumn(
            "__flags",
            F.transform(
                F.sequence(F.lit(1), F.size("__t")),
                lambda p: F.exists(
                    F.col("__starts"),
                    lambda s: (s <= p) & (p < s + span_len),
                ),
            ),
        )
        .withColumn(
            "__begins",
            F.filter(
                F.sequence(F.lit(1), F.size("__t")),
                lambda p: F.element_at(F.col("__flags"), p)
                & (
                    (p == 1)
                    | ~F.element_at(
                        F.col("__flags"), F.greatest(p - 1, F.lit(1))
                    )
                ),
            ),
        )
    )
    k_of = lambda p: F.size(  # noqa: E731
        F.filter(F.col("__begins"), lambda b: b <= p)
    ) - F.lit(1)
    sentinel = lambda k: F.concat(  # noqa: E731
        F.lit("<extra_id_"), k.cast("string"), F.lit(">")
    )
    inputs = F.array_join(
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.size("__t")),
                lambda p: F.when(
                    ~F.element_at(F.col("__flags"), p),
                    F.element_at(F.col("__t"), p),
                ).when(
                    F.array_contains(F.col("__begins"), p),
                    sentinel(k_of(p)),
                ).otherwise(F.lit("")),
            ),
            lambda x: x != "",
        ),
        " ",
    )
    targets_body = F.array_join(
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.size("__t")),
                lambda p: F.when(
                    ~F.element_at(F.col("__flags"), p), F.lit("")
                ).when(
                    F.array_contains(F.col("__begins"), p),
                    F.concat(
                        sentinel(k_of(p)),
                        F.lit(" "),
                        F.element_at(F.col("__t"), p),
                    ),
                ).otherwise(F.element_at(F.col("__t"), p)),
            ),
            lambda x: x != "",
        ),
        " ",
    )
    n_spans = F.size("__begins").cast("bigint")
    targets = F.when(
        n_spans > 0,
        F.concat(targets_body, F.lit(" "), sentinel(n_spans)),
    ).otherwise(sentinel(F.lit(0)))
    n_masked = F.size(F.filter("__flags", lambda x: x)).cast("bigint")
    return base.select(
        id_col,
        inputs.alias("inputs"),
        targets.alias("targets"),
        n_spans.alias("n_spans"),
        n_masked.alias("n_masked"),
    )


def chunk_documents_strided(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 32,
    stride_tokens: int = 24,
) -> DataFrame:
    """Overlapping-window chunking — long-context training prep (each
    window shares ``window−stride`` tokens with its predecessor, so no
    span longer than the overlap ever falls entirely between windows;
    the sliding-window convention BERT-style readers and context-
    extension corpora use). Windows start at 1, 1+stride, 1+2·stride,
    … while the start is inside the document; the last window is
    ragged. (id, chunk_idx, chunk_text, n_tokens), chunk_idx 1-based.

    Pure per-row codegen like :func:`chunk_documents` — token slices
    per window index, no shuffle, no Python. ``stride < window`` is
    the overlapped regime; ``stride == window`` degenerates to the
    fixed chunker."""
    if stride_tokens <= 0 or window_tokens <= 0:
        raise ValueError("window and stride must be positive")
    if stride_tokens > window_tokens:
        raise ValueError("stride must not exceed the window")
    # materialized token array (guide §1.2 / the cdc_chunks HOF
    # lesson) — the inline-split form re-tokenized once per window
    t = F.col("__t")
    n_windows = (
        F.floor(
            (F.size(t) - F.lit(1)) / F.lit(float(stride_tokens))
        ).cast("int")
        + F.lit(1)
    )
    chunks = F.when(
        F.size(t) >= 1,
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.concat_ws(
                " ",
                F.slice(t, (i - 1) * stride_tokens + 1, window_tokens),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = (
        df.select(F.col(id_col), tokens(text_col).alias("__t"))
        .select(F.col(id_col), F.posexplode(chunks))
        .withColumnRenamed("pos", "chunk_idx")
        .withColumnRenamed("col", "chunk_text")
    )
    return out.select(
        id_col,
        (F.col("chunk_idx") + 1).cast("bigint").alias("chunk_idx"),
        "chunk_text",
        F.array_size(tokens("chunk_text")).cast("bigint").alias("n_tokens"),
    )


def token_burstiness(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-token burstiness — the variance-to-mean ratio of a token's
    per-document counts over the WHOLE corpus (zeros included;
    Church & Gale 1995): function words spread evenly (ratio ≈ 1,
    Poisson-like), content words clump (ratio ≫ 1) — the signal
    keyword extractors and stopword inducers rank by.

    Exactness: with S = Σ tf, Q = Σ tf², N = corpus size (documents
    without the token contribute zero to both sums, so only postings
    aggregate), var/mean = (N·Q − S²)/(N·S) — a single division of
    exact BIGINTs rounded to 6 dp. One (doc, token) aggregation plus
    one token aggregation, both map-side combinable; text never
    shuffles."""
    tok = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("t")
    )
    n = F.broadcast(
        tok.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    tf = (
        tok.select("doc_id", F.explode("t").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    per_tok = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("s"),
        F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("q"),
    )
    ratio = F.round(
        (F.col("n_docs") * F.col("q") - F.col("s") * F.col("s")).cast(
            "double"
        )
        / (F.col("n_docs") * F.col("s")).cast("double"),
        6,
    )
    return per_tok.crossJoin(n).select(
        "token",
        "df",
        F.col("s").alias("total_tf"),
        ratio.alias("burstiness"),
    )
