"""Corpus-curation query catalog: global shuffle, token-budget
selection, per-source caps, and semantic dedup.

North-star extensions (SURVEY.md §2.9 — the reference has no
ordering/sampling surface; see operators/curation.py). The
global-order entries (shuffle, token budget, quantile prune, source
interleave) share the distributed prefix-sum machinery with
pack_sequences, so their DuckDB oracles — flat single-threaded
``ROW_NUMBER()/SUM() OVER (ORDER BY ...)`` windows — are exactly the
sequential semantics the parallel composition must reproduce
bit-for-bit. The semantic-dedup family layers exact/hot/portable the
same way the pairwise and MinHash families do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import curation as C
from ..operators import similarity as S
from ..sources.tables import load_table
from .registry import register


@register(
    "global_shuffle_documents",
    oracle="""
    SELECT doc_id,
           md5(CAST(doc_id AS VARCHAR) || ':42') AS shuffle_key,
           CAST(ROW_NUMBER() OVER (
                  ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'),
                           doc_id)
                AS BIGINT) AS pos
    FROM documents
    """,
)
def global_shuffle_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle (operators.curation.global_shuffle,
    seed 42): every document gets a reproducible md5 shuffle key and a
    materialized global position in key order. The position is a
    distributed global rank — range partition on the key, parallel
    per-partition row_numbers, tiny per-partition offset table
    broadcast back — never a single-task ``Window.orderBy``. The
    oracle replays the permutation as one flat ROW_NUMBER window;
    exact pos equality proves the parallel rank composes to the
    sequential order."""
    docs = load_table(spark, sf_dir, "documents")
    return C.global_shuffle(docs, "doc_id", seed=42).select(
        "doc_id", "shuffle_key", "pos"
    )


@register(
    "token_budget_select_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
      WHERE len(string_split(text, ' ')) > 0
    ), c AS (
      SELECT doc_id, n_chars, n_tokens,
             SUM(n_tokens) OVER (ORDER BY n_chars DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    ), b AS (
      SELECT CAST((SUM(n_tokens) * 3) // 10 AS BIGINT) AS budget FROM t
    )
    SELECT doc_id, n_chars,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum AS BIGINT) AS cum_tokens
    FROM c, b
    WHERE cum <= budget
    """,
)
def token_budget_select_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Token-budget corpus selection
    (operators.curation.token_budget_select): keep the best documents
    — ordered by (n_chars DESC, doc_id) — while the running token
    total stays within 3/10 of the corpus total. Budget arithmetic is
    integer end-to-end (``div`` in Spark, ``//`` in DuckDB), so the
    cut point is bit-identical across engines; the running total is
    the distributed prefix sum ordered by quality, and the grand
    total comes from the per-partition totals table (no second corpus
    scan). The oracle is the flat sequential window + scalar-subquery
    budget."""
    docs = load_table(spark, sf_dir, "documents")
    return C.token_budget_select(
        docs,
        "doc_id",
        "text",
        score_col="n_chars",
        budget_numer=3,
        budget_denom=10,
    )


@register(
    "cap_documents_per_source",
    oracle="""
    SELECT doc_id, source, n_chars, CAST(rn AS INT) AS rank
    FROM (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents) ranked
    WHERE rn <= 10
    """,
)
def cap_documents_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (operators.curation.cap_per_group):
    keep at most 10 documents per source, longest-first with doc_id
    tiebreak — the anti-domination guard against a handful of crawl
    domains drowning the mixture. Pure grouped window (one hash
    shuffle on source, no global order), linear at any corpus
    size."""
    docs = load_table(spark, sf_dir, "documents")
    return C.cap_per_group(
        docs,
        group_col="source",
        k=10,
        order_by=[F.col("n_chars").desc(), F.col("doc_id")],
    ).select("doc_id", "source", "n_chars", "rank")


@register("semantic_dedup_embeddings")  # rows-only: k-means quantizer
def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup
    (operators.similarity.semantic_dedup, arXiv:2303.09540): IVF
    k-means clustering blocks the space, exact cosine verifies only
    within a cell, keep-lowest-id survives. Rows-only by design — the
    driver records a rows+schema check because the k-means quantizer
    is not SQL-expressible; the binding bounds live in
    tests/test_similarity.py::TestSemanticDedup (drop precision 1.0
    by construction — every drop carries an exact verified cosine ≥
    threshold; recall ≥ 0.9 on planted same-cell near-dup clusters;
    repeated-run determinism). Threshold 0.4 matches the fixture's
    planted near-dup geometry (θ≈60°, the same bar
    embedding_near_dup_pairs verifies against), so the keep set is a
    strict subset on fixture data. Candidate volume is Σ_cell
    |cell|²/2 — the quantizer granularity, not the corpus, bounds the
    quadratic term; ``hot_cell_threshold=None`` pins the pure exact
    plan here (every fixture cell is cold — same layering as
    pairwise_topk_per_label: the guarded scale path is its own entry,
    ``semantic_dedup_embeddings_hot``)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup(
        emb, n_cells=16, threshold=0.4, hot_cell_threshold=None
    ).orderBy("vec_id")


@register("semantic_dedup_embeddings_hot")  # rows-only: scale-path probe
def semantic_dedup_embeddings_hot(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The hot-cell scale path of semantic dedup, forced onto fixture
    data with ``hot_cell_threshold=8`` so (nearly) every IVF cell
    routes through per-cell SRP sub-blocking — candidate volume
    ~n·target_block·tables per cell instead of |cell|². Rows-only by
    design (k-means + SRP are not SQL); the binding bounds live in
    tests/test_similarity.py::TestSemanticDedup — hot-path drop
    precision stays exact (every drop carries a verified cosine ≥
    threshold), recall ≥ 0.9 on planted same-cell near-dup clusters
    under the guard, and the kept set is deterministic."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup(
        emb,
        n_cells=16,
        threshold=0.4,
        hot_cell_threshold=8,
        hot_target_block=64,
    ).orderBy("vec_id")


@register(
    "semantic_dedup_fixed_cells",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv,
             CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ), c AS (
      SELECT vec_id AS cent_id, qv AS cq FROM q WHERE vec_id < 8
    ), d AS (
      SELECT q.vec_id, c.cent_id,
             list_sum(list_transform(list_zip(q.qv, c.cq),
               s -> (s[1] - s[2]) * (s[1] - s[2]))) AS d2
      FROM q CROSS JOIN c
    ), a AS (
      SELECT vec_id, cent_id AS ivf_cell FROM (
        SELECT vec_id, cent_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cent_id) AS rn
        FROM d) r
      WHERE rn = 1
    ), drops AS (
      SELECT DISTINCT y.vec_id
      FROM a x JOIN a y ON x.ivf_cell = y.ivf_cell AND x.vec_id < y.vec_id
      JOIN q qa ON qa.vec_id = x.vec_id
      JOIN q qb ON qb.vec_id = y.vec_id
      WHERE round(list_cosine_similarity(qa.v, qb.v), 6) >= 0.4
    )
    SELECT a.vec_id, CAST(a.ivf_cell AS BIGINT) AS ivf_cell
    FROM a ANTI JOIN drops USING (vec_id)
    """,
)
def semantic_dedup_fixed_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable-oracle twin of semantic dedup
    (operators.similarity.semantic_dedup_fixed_cells): fixed centroids
    (corpus rows vec_id < 8) + EXACT integer-arithmetic assignment
    (floor-quantized vectors, Σ(a−b)² argmin, ties to lowest centroid)
    + the same in-cell cosine verify and keep-lowest rule — every step
    replayed bit-for-bit by the DuckDB oracle. This is the hash-exact
    cross-engine proof of the cluster→verify→survivor pipeline that
    the k-means entry (rows-only by necessity) cannot give — the same
    role minhash_lsh_portable_pairs plays for the MinHash family."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup_fixed_cells(
        emb, n_centroids=8, threshold=0.4, scale=1000
    )


@register(
    "quality_prune_documents",
    oracle="""
    WITH r AS (
      SELECT doc_id, n_chars,
             CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id)
                  AS BIGINT) AS quality_rank
      FROM documents
    ), c AS (
      SELECT CAST((COUNT(*) * 1) // 10 AS BIGINT) AS cut FROM documents
    )
    SELECT doc_id, n_chars, quality_rank
    FROM r, c
    WHERE quality_rank > cut
    """,
)
def quality_prune_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop-worst-decile quantile prune
    (operators.curation.quality_prune): ascending global quality rank
    via the distributed rank primitive, integer-exact cut at
    n div 10 — no percentile interpolation, so the cut is
    bit-identical across engines. The oracle replays the rank as one
    flat ROW_NUMBER window plus a scalar count subquery."""
    docs = load_table(spark, sf_dir, "documents")
    return C.quality_prune(
        docs, "doc_id", score_col="n_chars", drop_numer=1, drop_denom=10
    )


@register(
    "interleave_sources_documents",
    oracle="""
    WITH r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'), doc_id)
               AS rnd
      FROM documents
    )
    SELECT doc_id, source, CAST(rnd AS INT) AS rnd,
           CAST(ROW_NUMBER() OVER (ORDER BY rnd, source, doc_id)
                AS BIGINT) AS interleave_pos
    FROM r
    """,
)
def interleave_sources_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Round-robin source interleaving
    (operators.curation.interleave_sources): within-source md5
    shuffle (grouped window) then a distributed global rank over
    (round, source, id) — every training window samples every source
    as evenly as the corpus allows. The oracle replays both levels as
    flat windows; exact interleave_pos equality proves the grouped
    round assignment and the parallel global rank compose."""
    docs = load_table(spark, sf_dir, "documents")
    return C.interleave_sources(docs, "doc_id", "source", seed=42).select(
        "doc_id", "source", "rnd", "interleave_pos"
    )


@register(
    "snapshot_diff_documents",
    oracle="""
    WITH old AS (
      SELECT doc_id, md5(text) AS fp FROM documents
    ), new AS (
      SELECT doc_id, md5(upper(text)) AS fp
      FROM documents WHERE doc_id % 7 <> 0 AND doc_id % 5 = 0
      UNION ALL
      SELECT doc_id, md5(text) AS fp
      FROM documents WHERE doc_id % 7 <> 0 AND doc_id % 5 <> 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, md5(text) AS fp
      FROM documents WHERE doc_id % 11 = 0
    )
    SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
           CASE WHEN old.doc_id IS NULL THEN 'added'
                WHEN new.doc_id IS NULL THEN 'removed'
                WHEN old.fp <> new.fp THEN 'modified' END AS change
    FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
    WHERE (old.doc_id IS NULL OR new.doc_id IS NULL OR old.fp <> new.fp)
    """,
)
def snapshot_diff_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus release audit (operators.governance.snapshot_diff): the
    'next snapshot' is derived in-plan from documents — every 7th doc
    removed, every remaining 5th doc's text rewritten, every 11th doc
    re-added under a shifted id — and the diff classifies
    added/removed/modified by md5 fingerprint over one full-outer
    join (digests shuffle, content never does). The oracle rebuilds
    both snapshots and the same join."""
    from ..operators.governance import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    new = (
        docs.where((F.col("doc_id") % 7 != 0) & (F.col("doc_id") % 5 == 0))
        .withColumn("text", F.upper("text"))
        .unionByName(
            docs.where(
                (F.col("doc_id") % 7 != 0) & (F.col("doc_id") % 5 != 0)
            )
        )
        .unionByName(
            docs.where(F.col("doc_id") % 11 == 0).withColumn(
                "doc_id", F.col("doc_id") + F.lit(1_000_000)
            )
        )
    )
    return snapshot_diff(docs, new, "doc_id", "text")
