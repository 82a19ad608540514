"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick pretraining documents from a huge raw pool so
the SELECTED distribution matches a small high-quality TARGET corpus,
using importance weights computed in a cheap hashed n-gram feature
space instead of a learned model.

North-star extension beyond the reference surface (the reference,
`/root/reference/spark_jobs/*.py`, has no selection operators at all);
completes the curation family's quality axis: ``quality_prune`` drops
by an intrinsic score, ``lm_bigram_score`` by corpus-self surprisal —
DSIR selects by RESEMBLANCE TO A TARGET, the recipe behind
domain-matched pretraining mixes (e.g. Wikipedia+books-matched
CommonCrawl subsets).

The recipe:

1. **Features**: every document is a bag of hashed n-grams — unigrams
   and adjacent bigrams hashed into ``n_buckets`` buckets (the paper
   uses 10k; fixture entries use less so every bucket is exercised).
   Hashing is the PORTABLE md5 scheme (``feature_hash_embed`` idiom),
   so any engine replays the bucketing bit-for-bit.
2. **Bucket language models**: unigram-over-buckets MLE with Laplace
   smoothing, fit on each side: ``p_t(b) = (t_b + 1) / (T + B)`` on
   the target, ``p_r(b)`` likewise on the raw pool (t_b/r_b = bucket
   occurrence counts, T/R totals, B = n_buckets).
3. **Log importance weight** per raw document:
   ``log w(x) = Σ_b c_b(x) · λ_b`` with
   ``λ_b = ln p_t(b) − ln p_r(b)`` — how much more likely the doc's
   features are under the target than under the raw pool.
4. **Selection**: either deterministic top-fraction by weight, or the
   paper's Gumbel-top-k importance RESAMPLING (adding Gumbel noise to
   log weights samples WITHOUT replacement ∝ softmax weights — avoids
   the pathology of hard top-k, which concentrates on near-duplicate
   extreme-weight docs).

Cross-engine exactness (the oracle contract): counts are integers;
each λ_b is ONE float expression rounded to 6 dp and cast to
DECIMAL(18,6); per-doc accumulation is then integer×decimal with a
DECIMAL sum — exact and partition-order-independent — and only the
final result casts back to double. The Gumbel key derives u from an
md5 prefix (an exact rational in (0,1)), so ``−ln(−ln(u))`` is the
same double on any engine that computes ln identically (held across
Spark/DuckDB for every fixture value — the ``lm_bigram_score``
precedent).

Scale shape: one explode of the raw corpus (the linear dominant term,
persisted and reused for the bucket counts AND the per-doc counts),
one explode of the (much smaller) target; bucket tables are
``n_buckets``-bounded with map-side partial aggregation and broadcast
back; per-doc aggregation is one hash shuffle on (id, bucket) of a
narrow integer frame. Selection ranks on the distributed prefix-sum
primitive (one range exchange, JVM-local rank). Nothing quadratic,
nothing collected to the driver beyond one-row scalars.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import claim_group, persist_into
from .prefix import ranged_rank
from .text import tokens


def _bucket(n_buckets: int) -> Column:
    """Portable md5 bucket of the ``__feat`` column
    (feature_hash_embed idiom): DuckDB replays as
    CAST(('0x' || substring(md5(f),1,8)) AS BIGINT) % n_buckets."""
    return F.expr(
        "CAST(conv(substring(md5(__feat), 1, 8), 16, 10) AS BIGINT)"
    ) % F.lit(int(n_buckets))


def _features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, __feat) — one row per unigram AND adjacent-bigram
    occurrence. Bigram text is ``w1 || ' ' || w2`` so the hashed
    feature space is exactly reproducible from the token stream.

    The token array is materialized one projection below (round 17,
    guide §1.2 / the cdc_chunks HOF lesson): the pre-r17 form called
    ``element_at(split(text), i)`` twice per bigram inside the
    transform lambda — O(n_tokens²) re-tokenization per document."""
    t = F.col("__t")
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i + 1), F.element_at(t, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col), tokens(text_col).alias("__t")
    ).select(
        F.col(id_col),
        F.explode(F.concat(t, bigrams)).alias("__feat"),
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Per-raw-document log importance weight under the hashed-n-gram
    bucket models (module docstring steps 1-3). Output:
    ``(id, n_feats, log_weight, avg_log_ratio)`` — ``log_weight`` is
    the exact decimal-accumulated Σ c_b·λ_b cast to double;
    ``avg_log_ratio`` (= log_weight / n_feats, 6 dp, 0.0 for
    feature-less docs) is the length-normalized variant the paper
    obtains by chunking — long documents otherwise get extreme
    weights simply by having more feature draws."""
    caches = claim_group("dsir_log_weights")
    B = int(n_buckets)
    raw_f = persist_into(
        caches,
        _features(raw, id_col, text_col).withColumn("__b", _bucket(B)),
    )
    tgt_f = _features(target, id_col, text_col).withColumn(
        "__b", _bucket(B)
    )
    r_counts = raw_f.groupBy("__b").agg(F.count(F.lit(1)).alias("__rc"))
    t_counts = tgt_f.groupBy("__b").agg(F.count(F.lit(1)).alias("__tc"))
    totals = (
        r_counts.agg(F.sum("__rc").alias("__R"))
        .crossJoin(
            t_counts.agg(
                F.coalesce(F.sum("__tc"), F.lit(0)).alias("__T")
            )
        )
    )
    # λ per bucket, over the buckets the raw pool touches (a raw doc
    # can only contain such buckets): one rounded float expression,
    # then exact decimal arithmetic from here on
    lam = (
        r_counts.join(t_counts, "__b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "__b",
            F.round(
                F.log(F.coalesce(F.col("__tc"), F.lit(0)) + 1.0)
                - F.log(F.col("__T").cast("double") + F.lit(float(B)))
                - F.log(F.col("__rc") + 1.0)
                + F.log(F.col("__R").cast("double") + F.lit(float(B))),
                6,
            )
            .cast("decimal(18,6)")
            .alias("__lam"),
        )
    )
    # join the broadcast λ table per feature OCCURRENCE and aggregate
    # once on id: map-side partial aggregation collapses a partition's
    # occurrences before the one id exchange, so this is strictly one
    # exchange fewer than a (id, bucket) pre-count + second agg — and
    # summing λ_b per occurrence is decimal-exact, identical to c·λ_b
    scored = (
        raw_f.join(F.broadcast(lam), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum(F.col("__lam")).alias("__lw"),
        )
        .select(
            id_col,
            "n_feats",
            F.col("__lw").cast("double").alias("log_weight"),
            F.round(
                F.col("__lw").cast("double") / F.col("n_feats"), 6
            ).alias("avg_log_ratio"),
        )
    )
    # feature-less raw docs (empty token stream can't occur with the
    # fixture split contract, but keep the operator total): weight 0
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
            F.coalesce("avg_log_ratio", F.lit(0.0)).alias("avg_log_ratio"),
        )
    )


def gumbel_key(
    id_col: str = "doc_id", seed: int = 42
) -> Column:
    """Deterministic standard-Gumbel draw per id: u derives from an
    md5 prefix as the exact rational (h+1)/(2^32+1) ∈ (0,1), then
    g = −ln(−ln u). Reproducible on any engine (DuckDB:
    ('0x' || substring(md5(...),1,8))::BIGINT)."""
    h = F.expr(
        "CAST(conv(substring(md5(concat(CAST(`"
        + id_col
        + "` AS STRING), ':"
        + str(int(seed))
        + "')), 1, 8), 16, 10) AS BIGINT)"
    )
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**32 + 1))
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    keep_numer: int = 1,
    keep_denom: int = 4,
    gumbel_seed: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Select ``keep_numer/keep_denom`` of the raw pool by importance
    weight (module docstring step 4): deterministic top-fraction when
    ``gumbel_seed`` is None, Gumbel-top-k importance resampling
    otherwise (the paper's estimator — sampling without replacement
    ∝ softmax of log weights). The cut count is integer arithmetic
    (``(N·numer) div denom``) and the rank order is
    ``(key DESC, id)`` with the key rounded at 6 dp — bit-identical
    across engines. Output: kept ``(id, n_feats, log_weight,
    sel_key, sel_rank)``.

    Scale: ranking rides :func:`.prefix.ranged_rank` — ONE range
    exchange of a four-column narrow frame; the corpus text never
    shuffles (callers re-join kept ids to payloads)."""
    w = dsir_log_weights(raw, target, id_col, text_col, n_buckets)
    if gumbel_seed is None:
        key = F.round(F.col("log_weight"), 6)
    else:
        key = F.round(
            F.col("log_weight") + gumbel_key(id_col, gumbel_seed), 6
        )
    base = w.withColumn("sel_key", key)
    order = [F.col("sel_key").desc(), F.col(id_col)]
    local, offsets = ranged_rank(base, order, partitions, "dsir_select")
    n_keep = offsets.agg(
        F.expr(
            f"(sum(__part_rows) * {int(keep_numer)})"
            f" div {int(keep_denom)}"
        )
        .cast("long")
        .alias("__keep")
    )
    return (
        local.join(
            F.broadcast(offsets.select("__pid", "__rank_offset")), "__pid"
        )
        .crossJoin(F.broadcast(n_keep))
        .withColumn(
            "sel_rank",
            (F.col("__local_rn") + F.col("__rank_offset")).cast("long"),
        )
        .where(F.col("sel_rank") <= F.col("__keep"))
        .select(id_col, "n_feats", "log_weight", "sel_key", "sel_rank")
    )
