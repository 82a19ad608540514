"""Trained linear quality classifier over hashed text features — the
fastText-style learned gate (Joulin et al. 2016) that production
LLM-data pipelines run AFTER the hand-tuned rules: GPT-3 (Brown et
al. 2020, App. A) and LLaMA both train a linear model on
reference-vs-crawl text and keep documents by score (GPT-3 with a
Pareto lottery so the tail is sampled, not cliffed). North-star
extension — no reference file; the reference engine has no learned
operators at all.

Design, Spark-first:

- **Features** are PORTABLE hashed token-PRESENCE indicators (the
  ``feature_hash_embed`` md5 bucket, any engine reproduces it) plus
  one dense document-length feature (n_tokens/100). Presence (not tf)
  keeps every feature O(1), so full-batch gradient descent is
  well-conditioned — tf-normalized features are ~1/doc_len and would
  need thousands of iterations to grow the weights a presence rule
  (e.g. "contains a stopword") requires. One explode + one distinct
  (id, bucket) aggregation, corpus-linear, pure codegen; the sparse
  long form ``(id, bucket)`` is the 100 TB shape — never a dense
  vector per row.
- **Training** is full-batch logistic gradient descent, T iterations,
  each iteration = one broadcast join of the (tiny, model-sized)
  weight table against the persisted feature frame, one per-doc
  margin aggregation, one per-bucket gradient aggregation. Only the
  D-row gradient is collected per iteration — the corpus never moves
  to the driver (the BPE/unigram artifact discipline).
- **Determinism** is the repo's integer micro-count contract: weights
  broadcast as integer micro-units (1e-6), per-doc margin numerators
  are EXACT integer sums, the sigmoid/residual step runs in ONE Arrow
  pandas_udf with numpy float64 (so an independent numpy reference
  reproduces training bit-for-bit — tests/test_classifier.py),
  residuals re-quantize to 1e-9 micro-units, and gradients aggregate
  as DECIMAL(38,0) — exact at any corpus size, no float accumulation
  order anywhere. Bit-identical weights on any partitioning.
- Feature layout (round 17, guide §2.3/§2.4): the training loop
  carries ONE persisted per-document row ``(id, bucket-array, y,
  n_tok)`` — the presence set as a sorted int array instead of
  exploded ``(id, bucket)`` rows. The per-doc margin is then a pure
  per-row fold over the array against a LITERAL weight array (no
  weight join, no per-doc aggregation, no shuffle), and the gradient
  is one explode + one tiny per-bucket shuffle per iteration. The
  pre-r17 shape paid, per iteration, a broadcast join + per-doc
  groupBy + doc-meta join — and referenced that subtree from THREE
  union branches (bucket/bias/length gradient rows), so the sigmoid
  UDF pipeline evaluated up to 3× per doc per iteration; the round-17
  form emits all three gradient contributions from one generator over
  a single evaluation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..caching import claim_group, persist_into
from .text import tokens

MICRO_W = 1_000_000  # weight quantum broadcast to executors
MICRO_R = 1_000_000_000  # residual quantum aggregated back
LEN_SCALE = 100.0  # n_tokens / LEN_SCALE is the dense length feature


def hashed_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """Sparse hashed token-presence features: one ``(id, bucket)`` row
    per DISTINCT bucket the document's tokens hash into (md5-derived,
    portable into the numpy parity reference)."""
    bucket = F.expr(
        "CAST(conv(substring(md5(__tok), 1, 8), 16, 10) AS BIGINT)"
        f" % {int(dim)}"
    )
    return (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__tok"))
        .select(F.col(id_col), bucket.cast("int").alias("bucket"))
        .distinct()
    )


def _presence_bucket_array(text_col: str, dim: int) -> F.Column:
    """The ARRAY twin of :func:`hashed_features`: a document's
    distinct presence buckets as a sorted int array, computed per row
    (no explode, no distinct exchange). Same md5 bucket per token,
    same distinct set — only the layout differs, so every integer
    derived from it (margins, gradients) is bit-identical to the
    exploded form's."""
    hashed = F.transform(
        tokens(text_col),
        lambda tok: (
            F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint")
            % F.lit(int(dim))
        ).cast("int"),
    )
    return F.coalesce(
        F.array_sort(F.array_distinct(hashed)),
        F.array().cast("array<int>"),
    )


def _w_micro_array(weights) -> F.Column:
    """The weight vector as a LITERAL long array in the exact integer
    micro-units the pre-r17 broadcast weight table carried
    (``int(round(w * MICRO_W))`` — same quantization, same sums)."""
    return F.array(
        *[F.lit(int(round(w * MICRO_W))).cast("long") for w in weights]
    )


def _margin_micro(bucket_arr, weights) -> F.Column:
    """Per-doc EXACT integer margin numerator Σ_{b present} w_micro_b
    (long — bounded by dim · max|w|·1e6, far under 2^63): a per-row
    integer fold over the presence array against the literal weight
    array — no join, no aggregation, no shuffle."""
    wm = _w_micro_array(weights)
    return F.aggregate(
        bucket_arr,
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.element_at(wm, b + F.lit(1)),
    )


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    iters: int = 40,
    lr: float = 6.0,
    l2: float = 1e-4,
    lr_decay: float = 0.15,
) -> dict:
    """Train the logistic model; returns the artifact dict
    ``{dim, bias, w_len, weights, iters, lr, l2}`` (model-sized, like
    a BPE merge list). ``label_col`` must be 0/1 (int or boolean).

    ``lr_decay`` anneals the step (lr_t = lr/(1 + decay·t)): plain
    full-batch GD on logistic loss overshoots into saturation (every
    score rounds to 0/1 — measured on the fixture: AUC collapses from
    ties at 6 dp), while the annealed schedule lands calibrated
    mid-range scores the Pareto lottery can actually use."""
    spark = df.sparkSession
    caches = claim_group("quality_classifier_train")
    # One persisted per-document row (round 17): the presence set as
    # a sorted int array next to label and length. No repartition is
    # needed at all — the loop below never joins or aggregates by id,
    # and its only shuffle is the dim+2-row per-bucket gradient
    # exchange, which AQE coalesces on any session (a user
    # repartition here would be AQE-exempt — ADVICE r16).
    docfeat = persist_into(
        caches,
        df.select(
            F.col(id_col),
            F.col(label_col).cast("int").alias("__y"),
            F.size(tokens(text_col)).cast("long").alias("__n_tok"),
            _presence_bucket_array(text_col, dim).alias("__b"),
        ),
    )
    n_docs = docfeat.count()  # materializes the cache
    if n_docs == 0:
        raise ValueError("empty training frame")

    weights = [0.0] * dim
    w_len = 0.0
    bias = 0.0
    for it in range(int(iters)):
        lr_t = lr / (1.0 + lr_decay * it)
        b_lit = float(bias)
        wl_lit = float(w_len)

        @pandas_udf("cb long, cl long")
        def resid(
            margin_micro: pd.Series, n_tok: pd.Series, y: pd.Series
        ) -> pd.DataFrame:
            # float64 numpy math — the parity reference replays this
            import numpy as np

            xl = n_tok.to_numpy("float64") / np.float64(LEN_SCALE)
            margin = (
                margin_micro.to_numpy("float64") / MICRO_W
                + wl_lit * xl
                + b_lit
            )
            r = 1.0 / (1.0 + np.exp(-margin)) - y.to_numpy("float64")
            return pd.DataFrame(
                {
                    "cb": np.rint(r * MICRO_R).astype("int64"),
                    "cl": np.rint(r * xl * MICRO_R).astype("int64"),
                }
            )

        scored = docfeat.select(
            "__b",
            resid(
                _margin_micro(F.col("__b"), weights), "__n_tok", "__y"
            ).alias("__r"),
        )
        # presence features: per-bucket gradient contribution of a doc
        # is exactly its residual, so the bucket gradient reuses cb.
        # Bias (bucket −1) and length (bucket −2) ride the SAME
        # generator — one evaluation of the margin+sigmoid pipeline
        # per doc, one tiny shuffle, ONE Spark job per iteration (the
        # pre-r17 three-branch union re-evaluated the scored subtree
        # per branch).
        contrib = F.concat(
            F.transform(
                "__b",
                lambda b: F.struct(
                    b.alias("bucket"), F.col("__r.cb").alias("c")
                ),
            ),
            F.array(
                F.struct(
                    F.lit(-1).alias("bucket"), F.col("__r.cb").alias("c")
                ),
                F.struct(
                    F.lit(-2).alias("bucket"), F.col("__r.cl").alias("c")
                ),
            ),
        )
        grad_rows = (
            scored.select(F.explode(contrib).alias("__g"))
            .groupBy(F.col("__g.bucket").alias("bucket"))
            .agg(F.sum(F.col("__g.c").cast("decimal(38,0)")).alias("g"))
            .collect()
        )
        g = {int(r["bucket"]): int(r["g"]) for r in grad_rows}
        for b in range(dim):
            gb = g.get(b, 0) / MICRO_R / n_docs
            weights[b] -= lr_t * (gb + l2 * weights[b])
        w_len -= lr_t * (g.get(-2, 0) / MICRO_R / n_docs + l2 * w_len)
        bias -= lr_t * (g.get(-1, 0) / MICRO_R / n_docs)
    claim_group("quality_classifier_train")  # release caches
    return {
        "dim": int(dim),
        "bias": float(bias),
        "w_len": float(w_len),
        "weights": [float(w) for w in weights],
        "iters": int(iters),
        "lr": float(lr),
        "l2": float(l2),
        "lr_decay": float(lr_decay),
    }


def score_quality_classifier(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document: ``(id, score)`` with score = σ(margin)
    rounded to 6 dp (the ``avg_neg_logprob`` float-column idiom).
    Same exact-integer margin path as training — and, round 17, a
    pure map stage: presence array + literal-weight fold per row,
    then the Arrow sigmoid. ZERO exchanges (the pre-r17 shape paid a
    distinct exchange, a per-doc margin groupBy and two joins);
    pinned by tests/test_plan_shapes.py."""
    dim = int(model["dim"])
    b_lit = float(model["bias"])
    wl_lit = float(model["w_len"])

    @pandas_udf("double")
    def sig6(margin_micro: pd.Series, n_tok: pd.Series) -> pd.Series:
        import numpy as np

        xl = n_tok.to_numpy("float64") / np.float64(LEN_SCALE)
        margin = (
            margin_micro.to_numpy("float64") / MICRO_W
            + wl_lit * xl
            + b_lit
        )
        return pd.Series(np.round(1.0 / (1.0 + np.exp(-margin)), 6))

    base = df.select(
        F.col(id_col),
        _margin_micro(
            _presence_bucket_array(text_col, dim), model["weights"]
        ).alias("margin_micro"),
        F.size(tokens(text_col)).cast("long").alias("__n_tok"),
    )
    return base.select(
        F.col(id_col), sig6("margin_micro", "__n_tok").alias("score")
    )


def pareto_select(
    scored: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    alpha: int = 9,
) -> DataFrame:
    """GPT-3's quality lottery (Brown et al. 2020 App. A): keep a
    document iff ``pareto_draw > 1 - score`` with a Pareto(α) draw —
    high scores always survive, low scores survive with a heavy-tail
    probability, so the kept corpus is not a hard score cliff.

    The draw is DETERMINISTIC: u ∈ (0,1] from the md5 of the id (the
    repo's hash-determinism sampling contract — reruns and engines
    agree), pareto = u^(-1/α) − 1. Pure codegen, no shuffle."""
    return (
        pareto_flags(scored, id_col, score_col, alpha)
        .where(F.col("kept") == 1)
        .select(F.col(id_col), F.col(score_col))
    )


def pareto_flags(
    scored: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    alpha: int = 9,
) -> DataFrame:
    """:func:`pareto_select` with the verdict kept per row instead of
    filtered — the audit form (every doc, its score, and whether the
    lottery kept it)."""
    u = (
        F.expr(
            f"CAST(conv(substring(md5(CAST({id_col} AS STRING)), 1, 13),"
            " 16, 10) AS DOUBLE)"
        )
        + F.lit(1.0)
    ) / F.lit(float(16**13))
    draw = F.pow(u, F.lit(-1.0 / float(alpha))) - F.lit(1.0)
    return scored.withColumn(
        "kept", (draw > F.lit(1.0) - F.col(score_col)).cast("int")
    )


def save_classifier(spark: SparkSession, model: dict, path: str) -> None:
    """Persist the artifact: a weights table plus a one-row meta table
    (the tokenizer-artifact layout — load-side needs no JSON)."""
    rows = [(int(b), float(w)) for b, w in enumerate(model["weights"])]
    spark.createDataFrame(
        rows, schema="bucket int, weight double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/weights")
    spark.createDataFrame(
        [
            (
                int(model["dim"]),
                float(model["bias"]),
                float(model["w_len"]),
                int(model["iters"]),
                float(model["lr"]),
                float(model["l2"]),
                float(model.get("lr_decay", 0.0)),
            )
        ],
        schema=(
            "dim int, bias double, w_len double, iters int,"
            " lr double, l2 double, lr_decay double"
        ),
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_classifier(spark: SparkSession, path: str) -> dict:
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    w = {
        int(r["bucket"]): float(r["weight"])
        for r in spark.read.parquet(f"{path}/weights").collect()
    }
    return {
        "dim": int(meta["dim"]),
        "bias": float(meta["bias"]),
        "w_len": float(meta["w_len"]),
        "weights": [w.get(b, 0.0) for b in range(int(meta["dim"]))],
        "iters": int(meta["iters"]),
        "lr": float(meta["lr"]),
        "l2": float(meta["l2"]),
        "lr_decay": float(meta["lr_decay"]),
    }
