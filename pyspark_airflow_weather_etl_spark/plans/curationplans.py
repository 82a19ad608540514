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


# Shared by semantic_dedup_fixed_cells (one-shot) and
# semantic_dedup_incremental_cells (batch loop): SemDeDup's drop rule
# is monotone and a pair is first co-present exactly when its later-
# arriving member lands, so the loop's final kept set EQUALS the
# one-shot run's — both hash against this single full-corpus replay.
_FIXED_CELLS_ORACLE = """
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
    """


@register("semantic_dedup_fixed_cells", oracle=_FIXED_CELLS_ORACLE)
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


#: One built incremental index per sf_dir — temp trees live for the
#: session (the minhash_index_path lifecycle pattern).
_SEMANTIC_INC: dict[str, tuple[str, list]] = {}


def _semantic_incremental_state(
    spark: SparkSession, sf_dir: str
) -> tuple[str, list]:
    """Replay the full incremental loop once per sf_dir: agreed
    centroid table written up front, then four batches
    (``pmod(vec_id, 4)`` groups, processed in the PERMUTED order
    2,0,3,1 — arrival order is deliberately not id order) each
    computing its drop decisions against the index-so-far
    (``before_batch`` snapshot pin) and appending batch-keyed
    partitions. Returns (index_path, [drops frames])."""
    if sf_dir not in _SEMANTIC_INC:
        import tempfile

        emb = load_table(spark, sf_dir, "embeddings")
        path = tempfile.mkdtemp(prefix="semantic_inc_") + "/idx"
        S.semantic_centroids_write_fixed(emb, path, n_centroids=8)
        drops = []
        for pos, b in enumerate([2, 0, 3, 1]):
            batch = emb.where(F.pmod(F.col("vec_id"), F.lit(4)) == b)
            drops.append(
                S.semantic_dedup_incremental_fixed(
                    batch, path, threshold=0.4, before_batch=pos
                )
            )
            S.semantic_index_append_fixed(batch, path, batch_id=pos)
        _SEMANTIC_INC[sf_dir] = (path, drops)
    return _SEMANTIC_INC[sf_dir]


@register("semantic_dedup_incremental_cells", oracle=_FIXED_CELLS_ORACLE)
def semantic_dedup_incremental_cells(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental SemDeDup against an AT-REST index
    (operators.similarity.semantic_dedup_incremental_fixed) — the
    embedding-family parity of ``minhash_dedup_incremental``: the
    corpus arrives as four batches in a permuted order; each batch
    assigns against the SAME stored centroid table, verifies exact
    cosine only within its touched cells against the index-so-far
    (partition-pruned read) plus itself, and appends batch-keyed cell
    partitions. Kept = all appended rows minus the union of per-batch
    drop decisions (a drop can hit an INDEX row when a later batch
    brings a lower-id near-dup). HASH-EXACT against the one-shot
    fixed-cells oracle: SemDeDup's keep-lowest rule is monotone and
    every near-dup pair is first co-present exactly when its later
    member arrives, so the loop's drop union equals the one-shot drop
    set for ANY arrival order — per-batch cost O(batch + touched
    cells), never O(corpus)."""
    path, drops = _semantic_incremental_state(spark, sf_dir)
    all_rows = spark.read.parquet(f"{path}/rows").select(
        "vec_id", F.col("ivf_cell").cast("long").alias("ivf_cell")
    )
    all_drops = drops[0]
    for d in drops[1:]:
        all_drops = all_drops.unionByName(d)
    return all_rows.join(
        all_drops.select("vec_id").distinct(), "vec_id", "left_anti"
    )


#: Production-shape (k-means) incremental index per sf_dir.
_SEMANTIC_INC_KMEANS: dict[str, tuple[str, list]] = {}


def _semantic_incremental_kmeans_state(
    spark: SparkSession, sf_dir: str
) -> tuple[str, list]:
    """The k-means edition of the incremental loop: centroids trained
    ONCE on the full corpus sample (ivf_train_centroids — at scale,
    the bootstrap crawl), stored at rest, never retrained; batches
    arrive in the permuted order 1,3,0,2 and assign with the Arrow
    matmul kernel against the stored table."""
    if sf_dir not in _SEMANTIC_INC_KMEANS:
        import tempfile

        emb = load_table(spark, sf_dir, "embeddings")
        path = tempfile.mkdtemp(prefix="semantic_inc_km_") + "/idx"
        # bootstrap: centroids only (rows arrive via appends)
        cents = S.ivf_train_centroids(emb, n_cells=16)
        spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(cents)],
            "cell_id int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
        drops = []
        for pos, b in enumerate([1, 3, 0, 2]):
            batch = emb.where(F.pmod(F.col("vec_id"), F.lit(4)) == b)
            drops.append(
                S.semantic_dedup_incremental(
                    batch, path, threshold=0.4, before_batch=pos
                )
            )
            S.semantic_index_append(batch, path, batch_id=pos)
        _SEMANTIC_INC_KMEANS[sf_dir] = (path, drops)
    return _SEMANTIC_INC_KMEANS[sf_dir]


@register("semantic_dedup_incremental_embeddings")  # rows-only: k-means
def semantic_dedup_incremental_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Production-shape incremental SemDeDup
    (operators.similarity.semantic_dedup_incremental): trained IVF
    centroids stored at rest, Arrow-matmul batch assignment, exact
    cosine verify only within touched cells vs the index-so-far,
    batch-keyed replay-idempotent appends. Rows-only by design
    (k-means is not SQL); the binding evidence is
    tests/test_similarity.py::TestIncrementalSemanticDedup — the
    loop's kept set must EQUAL the one-shot batch restriction with
    the same stored centroids, for a permuted arrival order."""
    path, drops = _semantic_incremental_kmeans_state(spark, sf_dir)
    all_rows = spark.read.parquet(f"{path}/rows").select(
        "vec_id", F.col("ivf_cell").cast("long").alias("ivf_cell")
    )
    all_drops = drops[0]
    for d in drops[1:]:
        all_drops = all_drops.unionByName(d)
    return all_rows.join(
        all_drops.select("vec_id").distinct(), "vec_id", "left_anti"
    ).orderBy("vec_id")


@register("semantic_dedup_embeddings_nprobe")  # rows-only: k-means+probes
def semantic_dedup_embeddings_nprobe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-cell-complete semantic dedup: nprobe=4 multi-probe
    assignment (operators.similarity.semantic_dedup) — every vector
    verifies in its 4 nearest cells, closing the measured 62-64%
    cross-cell pair leakage of the nprobe=1 contract (pair coverage
    0.96-1.0 at 4 probes, tests/test_similarity.py::
    test_cross_cell_leakage_measured_and_nprobe_recovers). Candidate
    volume ≤ 16× the single-probe plan (nprobe²) — the recall/cost
    dial a completeness-critical dedup run turns. Rows-only (k-means);
    the operator-level bound — kept(nprobe=4) equals the global
    all-pairs keep-lowest rule at full coverage — is pinned in the
    same test file."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup(
        emb, n_cells=16, threshold=0.4, hot_cell_threshold=None, nprobe=4
    ).orderBy("vec_id")


def _dsir_weight_cte(n_buckets: int = 64) -> str:
    """Shared DuckDB replay of operators.dsir.dsir_log_weights on the
    fixture split (target = doc_id % 7 == 0, raw pool = the rest):
    hashed unigram+bigram features, Laplace bucket LMs, per-bucket
    log-ratio rounded to 6 dp into DECIMAL(18,6), exact
    integer×decimal accumulation per document. Ends with the CTE
    ``w(doc_id, n_feats, log_weight, avg_log_ratio)`` covering every
    raw-pool doc (feature-less docs at 0)."""
    B = int(n_buckets)
    return f"""
    WITH rawtk AS (
      SELECT doc_id, string_split(text, ' ') AS tk
      FROM documents WHERE doc_id % 7 <> 0
    ), tgttk AS (
      SELECT doc_id, string_split(text, ' ') AS tk
      FROM documents WHERE doc_id % 7 = 0
    ), rfeat AS (
      SELECT doc_id, f FROM (
        SELECT doc_id, unnest(tk) AS f FROM rawtk
        UNION ALL
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, len(tk) - 1),
                 i -> tk[i] || ' ' || tk[i + 1])) AS f
        FROM rawtk
      )
    ), tfeat AS (
      SELECT doc_id, f FROM (
        SELECT doc_id, unnest(tk) AS f FROM tgttk
        UNION ALL
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, len(tk) - 1),
                 i -> tk[i] || ' ' || tk[i + 1])) AS f
        FROM tgttk
      )
    ), rb AS (
      SELECT CAST(('0x' || substring(md5(f), 1, 8)) AS BIGINT) % {B} AS b,
             COUNT(*) AS rc
      FROM rfeat GROUP BY 1
    ), tb AS (
      SELECT CAST(('0x' || substring(md5(f), 1, 8)) AS BIGINT) % {B} AS b,
             COUNT(*) AS tc
      FROM tfeat GROUP BY 1
    ), lam AS (
      SELECT rb.b,
             CAST(round(
               ln(COALESCE(tb.tc, 0) + 1.0)
               - ln((SELECT SUM(tc) FROM tb) + {B}.0)
               - ln(rb.rc + 1.0)
               + ln((SELECT SUM(rc) FROM rb) + {B}.0), 6)
               AS DECIMAL(18,6)) AS lam
      FROM rb LEFT JOIN tb USING (b)
    ), docb AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(f), 1, 8)) AS BIGINT) % {B} AS b,
             COUNT(*) AS c
      FROM rfeat GROUP BY 1, 2
    ), w0 AS (
      SELECT d.doc_id,
             CAST(SUM(d.c) AS BIGINT) AS n_feats,
             CAST(SUM(d.c * l.lam) AS DOUBLE) AS log_weight,
             round(CAST(SUM(d.c * l.lam) AS DOUBLE) / SUM(d.c), 6)
               AS avg_log_ratio
      FROM docb d JOIN lam l USING (b)
      GROUP BY d.doc_id
    ), w AS (
      SELECT r.doc_id,
             COALESCE(w0.n_feats, 0) AS n_feats,
             COALESCE(w0.log_weight, 0.0) AS log_weight,
             COALESCE(w0.avg_log_ratio, 0.0) AS avg_log_ratio
      FROM (SELECT doc_id FROM documents WHERE doc_id % 7 <> 0) r
      LEFT JOIN w0 USING (doc_id)
    )
    """


def _dsir_split(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.where(F.col("doc_id") % 7 != 0),
        docs.where(F.col("doc_id") % 7 == 0),
    )


@register(
    "dsir_logweights_documents",
    oracle=_dsir_weight_cte()
    + "SELECT doc_id, n_feats, log_weight, avg_log_ratio FROM w",
)
def dsir_logweights_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR log importance weights (operators.dsir.dsir_log_weights,
    arXiv:2302.03169): hashed unigram+bigram bucket LMs fit on the
    target split (doc_id % 7 == 0) vs the raw pool, per-raw-doc
    log w(x) = Σ c_b·λ_b. λ_b is one rounded float per bucket cast to
    DECIMAL(18,6); accumulation is integer×decimal — exact and
    partition-order-independent — so the DuckDB replay hash-matches
    bit for bit. The selection entries build on these weights."""
    from ..operators import dsir as D

    raw, target = _dsir_split(spark, sf_dir)
    return D.dsir_log_weights(raw, target, "doc_id", "text", n_buckets=64)


@register(
    "dsir_select_documents",
    oracle=_dsir_weight_cte()
    + """
    , ranked AS (
      SELECT doc_id, n_feats, log_weight,
             round(log_weight, 6) AS sel_key,
             CAST(ROW_NUMBER() OVER (
                    ORDER BY round(log_weight, 6) DESC, doc_id)
                  AS BIGINT) AS sel_rank
      FROM w
    )
    SELECT doc_id, n_feats, log_weight, sel_key, sel_rank
    FROM ranked
    WHERE sel_rank <= (SELECT (COUNT(*) * 1) // 4 FROM w)
    """,
)
def dsir_select_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic DSIR top-fraction selection
    (operators.dsir.dsir_select, gumbel_seed=None): keep the quarter
    of the raw pool most target-like by (rounded log weight DESC, id).
    The rank is the distributed prefix-sum rank (one range exchange of
    a narrow frame — corpus text never shuffles); the integer cut
    count makes the boundary bit-identical. Oracle replays as one flat
    ROW_NUMBER window."""
    from ..operators import dsir as D

    raw, target = _dsir_split(spark, sf_dir)
    return D.dsir_select(
        raw, target, "doc_id", "text", n_buckets=64,
        keep_numer=1, keep_denom=4,
    )


@register(
    "dsir_gumbel_sample_documents",
    oracle=_dsir_weight_cte()
    + """
    , keyed AS (
      SELECT doc_id, n_feats, log_weight,
             round(log_weight
                   + (-ln(-ln(
                       (CAST(('0x' || substring(
                          md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 8))
                          AS BIGINT) + 1) / 4294967297.0))), 6)
               AS sel_key
      FROM w
    ), ranked AS (
      SELECT doc_id, n_feats, log_weight, sel_key,
             CAST(ROW_NUMBER() OVER (ORDER BY sel_key DESC, doc_id)
                  AS BIGINT) AS sel_rank
      FROM keyed
    )
    SELECT doc_id, n_feats, log_weight, sel_key, sel_rank
    FROM ranked
    WHERE sel_rank <= (SELECT (COUNT(*) * 1) // 4 FROM w)
    """,
)
def dsir_gumbel_sample_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DSIR Gumbel-top-k importance RESAMPLING
    (operators.dsir.dsir_select, gumbel_seed=7) — the paper's
    estimator: adding a standard-Gumbel draw to each log weight and
    taking the top k samples WITHOUT replacement ∝ softmax weights,
    avoiding hard top-k's concentration on near-duplicate
    extreme-weight docs. The Gumbel draw derives from an md5 prefix
    (u = (h+1)/(2^32+1), g = −ln(−ln u)) so the sample is a pure
    function of (id, seed) — reproducible on any engine, and the
    DuckDB replay hash-matches."""
    from ..operators import dsir as D

    raw, target = _dsir_split(spark, sf_dir)
    return D.dsir_select(
        raw, target, "doc_id", "text", n_buckets=64,
        keep_numer=1, keep_denom=4, gumbel_seed=7,
    )


@register(
    "training_shard_manifest",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (
                    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'),
                             doc_id)
                  AS BIGINT) AS pos
      FROM documents
    ), sh AS (
      SELECT doc_id, pos, (pos - 1) // 256 AS shard FROM s
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(pos) AS min_pos, MAX(pos) AS max_pos,
           CAST(SUM(CAST(('0x' || substring(
                 md5(CAST(pos AS VARCHAR) || ':'
                     || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT))
                AS VARCHAR) AS ids_digest
    FROM sh GROUP BY shard
    """,
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch manifest of a training-shard tree
    (operators.curation.write_shard_manifest): documents sharded at
    seed 42 / 256 rows, then one column-pruned scan computes per-shard
    row counts, pos ranges, and an order-independent md5-derived
    content digest (exact DECIMAL sum — any engine, any partitioning,
    same digits). The oracle replays shuffle→shard→aggregate from the
    raw table, so equality proves the WHOLE chain: the shard write
    put exactly the right rows in the right shards and the digest
    algebra is portable. verify_epoch (lost-file detection) is pinned
    in tests/test_curation.py."""
    import tempfile

    from ..operators.curation import (
        write_shard_manifest,
        write_training_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="shard_manifest_")
    write_training_shards(docs, f"{tmp}/epoch", "doc_id", seed=42,
                          shard_rows=256)
    return write_shard_manifest(spark, f"{tmp}/epoch", "doc_id")


# The flagship end-to-end curation pipeline oracle (VERDICT r15 #6):
# every stage of operators.curation.curate_corpus chained as one CTE
# pipeline — each CTE is the (already individually oracle-checked)
# stage's SQL applied to the PREVIOUS stage's survivors, in the
# pipeline's own order: gopher gate (min_words=20, min_stopwords=1) →
# exact dedup (canonical = lowest id per md5(text)) → phrase
# decontamination → drop-worst-1/10 quality prune → per-source cap 10
# → 3/10 token-budget cut → shards (the shard write itself is pinned
# by training_shard_manifest; this oracle checks the KEPT SET the
# shards contain).
_CURATE_ORACLE = """
    WITH tok AS (
      SELECT doc_id, text, lang, source, n_chars,
             string_split(text, ' ') AS tk
      FROM documents
    ), stats AS (
      SELECT doc_id, text, lang, source, n_chars, tk,
        CAST(len(tk) AS BIGINT) AS n_words,
        CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT)
          AS sum_len,
        CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-zA-Z]')))
          AS BIGINT) AS n_alpha,
        CAST(len(list_distinct(list_filter(tk, x -> x IN
          ('the','be','to','of','and','that','have','with'))))
          AS BIGINT) AS n_stop,
        CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
          + (CAST(length(text)
               - length(replace(text, '...', '')) AS BIGINT) // 3)
          AS n_symbol,
        CAST(len(list_transform(
              generate_series(1, GREATEST(len(tk) - 2, 0)),
              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
          AS BIGINT) AS nt,
        CAST(len(list_distinct(list_transform(
              generate_series(1, GREATEST(len(tk) - 2, 0)),
              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])))
          AS BIGINT) AS nd
      FROM tok
    ), g AS (
      SELECT doc_id, text, lang, source, n_chars, tk FROM stats
      WHERE n_words >= 20 AND n_words <= 100000
        AND sum_len >= 3 * n_words AND sum_len <= 10 * n_words
        AND n_symbol * 10 <= 1 * n_words
        AND n_alpha * 100 >= 80 * n_words
        AND n_stop >= 1
        AND (nt - nd) * 100 <= 30 * nt
    ), dd AS (
      SELECT * FROM g
      QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text)
                                 ORDER BY doc_id) = 1
    ), dec AS (
      SELECT * FROM dd
      WHERE NOT (' ' || text || ' ' LIKE '% key agg row %'
              OR ' ' || text || ' ' LIKE '% batch window spark %')
    ), pr AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS qrank,
               COUNT(*) OVER () AS npool
        FROM dec)
      WHERE qrank > npool // 10
    ), cap AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY n_chars DESC, doc_id)
                 AS srn
        FROM pr)
      WHERE srn <= 10
    ), bud AS (
      SELECT doc_id, lang, source, n_chars FROM (
        SELECT doc_id, lang, source, n_chars,
               SUM(CAST(len(tk) AS BIGINT)) OVER (
                 ORDER BY n_chars DESC, doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(CAST(len(tk) AS BIGINT)) OVER () AS tot
        FROM cap)
      WHERE cum <= (tot * 3) // 10
    )
    SELECT doc_id, lang, source, n_chars FROM bud
    """

#: Per-process cache of curated releases: sf_dir -> shard path.
_CURATED: dict[str, str] = {}


@register("curate_corpus_documents", oracle=_CURATE_ORACLE)
def curate_corpus_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END training-corpus curation pipeline as one catalog
    entry (operators.curation.curate_corpus — VERDICT r15 #6, the
    flagship LLM-training-data demonstration): Gopher rule gate →
    exact dedup → benchmark-phrase decontamination → drop-worst-1/10
    quality prune → per-source anti-domination cap → 3/10
    token-budget cut → deterministic shuffle into fixed-row training
    shards at rest. The returned frame is the release read BACK from
    the written shards (so the oracle checks what the shards actually
    contain, not an in-memory intermediate); every stage is
    individually oracle-checked elsewhere, and this entry pins their
    COMPOSITION hash-exact through one CTE-chained DuckDB replay."""
    if sf_dir not in _CURATED:
        import tempfile

        docs = load_table(spark, sf_dir, "documents")
        out = tempfile.mkdtemp(prefix="curate_") + "/release"
        C.curate_corpus(
            docs,
            out,
            benchmark_phrases=["key agg row", "batch window spark"],
            gopher_rules={"min_words": 20, "min_stopwords": 1},
            drop_worst_numer=1,
            drop_worst_denom=10,
            per_source_cap=10,
            budget_numer=3,
            budget_denom=10,
            shard_rows=64,
        )
        _CURATED[sf_dir] = out
    return spark.read.parquet(_CURATED[sf_dir]).select(
        "doc_id", "lang", "source", "n_chars"
    )
