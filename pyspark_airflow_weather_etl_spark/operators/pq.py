"""Product quantization (PQ) ANN: train → encode → ADC scan → IVF-PQ.

North-star extension beyond the reference's surface (the reference has
no vector search at all — SURVEY.md §2.9 similarity family): the
memory-scale path for embedding retrieval. A 64-dim float32 vector is
256 B at rest; its PQ code at m=8 sub-vectors × 1-byte codes is 8 B —
a 32× compression that is what makes billion-vector (100 TB corpus)
scans feasible at all. The design follows the public FAISS/Jégou
IVFADC recipe (Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011):

- **Train** (:func:`pq_train_codebooks`): per-sub-vector k-means on a
  deterministic driver-side sample — the same bounded-sample recipe as
  :func:`..operators.similarity.ivf_train_centroids` (the sample is
  ``limit(sample_rows)``-bounded by design; training is O(sample), not
  O(corpus), and the distributed part is the encode below).
- **Encode** (:func:`pq_encode`): one Arrow-batched numpy matmul per
  sub-vector per batch — the documented exception to the built-ins-
  first rule (dense matmul is what Catalyst expression eval is worst
  at, same shape as ``srp_signature``). Runs ONCE at index-build time,
  never per query.
- **Scan** (:func:`pq_topk_adc`): asymmetric distance computation —
  the query builds an (m × n_codes) lookup table of exact sub-vector
  squared distances driver-side (O(n_codes·dim) — microseconds), and
  every row's approximate distance is m integer array lookups summed
  in a PURE-JVM codegen expression over the 8-byte codes. No Python,
  no vector column read, in the per-query hot path.
- **IVF-PQ at rest** (:func:`ivfpq_index_write` /
  :func:`ivfpq_topk_at_rest`): codes laid out under the coarse
  quantizer's ``ivf_cell=<n>`` partitions; a probe reads nprobe of
  n_cells partitions via partition pruning, ADC-ranks the codes
  JVM-side, and exact-re-ranks only the top ``rerank`` survivors on
  their stored raw vectors — the standard two-stage IVFADC search.

Approximation contract: ADC ranks by quantized distance, so the
catalog entries are rows-only (like the SRP/IVF family) with recall
bounds pinned in tests/test_pq.py. The hash-exact cross-engine proof
of the encode→LUT→ADC pipeline is the fixed-codebook twin
(:func:`pq_encode_fixed` / :func:`pq_adc_topk_fixed`): codebooks taken
from the corpus itself, floor-quantized integer arithmetic end to end,
replayed bit-for-bit by a DuckDB oracle — the same role
``semantic_dedup_fixed_cells`` plays for the k-means dedup family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEED = 42


def pq_train_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    sample_rows: int = 512,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train PQ codebooks: independent k-means (Lloyd, fixed seed) per
    sub-vector on a deterministic sample. Returns (m, n_codes, dim/m).

    Driver-side on a bounded sample by design (the FAISS recipe — a
    quantizer trained on ~10⁵ rows generalizes; the corpus-sized work
    is the encode). Empty clusters keep their previous centroid, so
    the codebook shape is always (m, n_codes, dsub) and encode's
    argmin is total."""
    sample = np.asarray(
        [
            [float(x) for x in r[0]]
            for r in embeddings.select(vec_col)
            .orderBy(id_col)
            .limit(sample_rows)
            .collect()
        ],
        dtype=np.float64,
    )
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(SEED)
    books = np.empty((m, n_codes, dsub), dtype=np.float64)
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        cents = sub[rng.choice(len(sub), n_codes, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Encode vectors to their PQ codes: ``out_col`` is an
    ``array<int>`` of length m (code j = nearest codebook-j centroid
    of sub-vector j; exact ties break to the lowest code, matching
    numpy argmin). One Arrow batch does all m sub-vector argmins as m
    small matmuls — this is the index-build step, run once per corpus,
    and the only Python in the PQ family."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = books.shape
    b_sq = (books**2).sum(axis=2)  # (m, n_codes)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def _codes(v: pd.Series) -> pd.Series:
        mask = v.notna().to_numpy()
        out = [None] * len(v)
        if mask.any():
            x = np.vstack(v[mask].to_numpy()).astype(np.float64)
            codes = np.empty((x.shape[0], m), dtype=np.int64)
            for j in range(m):
                sub = x[:, j * dsub : (j + 1) * dsub]
                # same decision statistic as ivf_assign: −2·x@cᵀ+|c|²
                stat = -2.0 * (sub @ books[j].T) + b_sq[j][None, :]
                codes[:, j] = stat.argmin(axis=1)
            for row, i in enumerate(np.flatnonzero(mask)):
                out[i] = [int(z) for z in codes[row]]
        return pd.Series(out, dtype=object)

    return df.withColumn(out_col, _codes(F.col(vec_col)))


def adc_lut(query_vec: list[float], codebooks: np.ndarray) -> np.ndarray:
    """The ADC lookup table: (m × n_codes) exact squared distances
    from each query sub-vector to each code. O(n_codes·dim) — built
    per query on the driver, enters the plan as a literal (~m·n_codes
    doubles, broadcast-trivial)."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = books.shape
    q = np.asarray(query_vec, dtype=np.float64)
    if q.shape[0] != m * dsub:
        raise ValueError(f"query dim {q.shape[0]} != {m * dsub}")
    lut = np.empty((m, n_codes), dtype=np.float64)
    for j in range(m):
        lut[j] = ((books[j] - q[j * dsub : (j + 1) * dsub][None, :]) ** 2).sum(
            axis=1
        )
    return lut


def _adc_score(lut: np.ndarray, code_col: str) -> F.Column:
    """Σ_j lut[j][code_j] as a pure-JVM codegen expression: m literal
    array lookups and a sum — the per-row ADC cost is independent of
    the vector dimension, which is the entire point of PQ.

    The explicit isNotNull guard is load-bearing, not defensive
    paranoia: measured on this Spark build (ANSI codegen),
    ``element_at(lit_array, element_at(null_code, j) + 1)`` returns a
    garbage element instead of NULL — the inner null index fails to
    propagate through the arithmetic into the outer lookup. A null
    code row would otherwise score a plausible-looking finite distance
    and could silently claim a top-k slot (regression:
    tests/test_pq.py::test_null_embedding_sinks_not_ranks_first)."""
    m = lut.shape[0]
    terms = [
        F.element_at(
            F.array(*[F.lit(float(x)) for x in lut[j]]),
            F.element_at(F.col(code_col), j + 1) + F.lit(1),
        )
        for j in range(m)
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return F.when(F.col(code_col).isNotNull(), total)


def pq_topk_adc(
    embeddings: DataFrame,
    query_vec: list[float],
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate L2 top-k by ADC over freshly-encoded vectors:
    (id, adc_d2) for the k smallest quantized distances, ties to the
    lowest id. The at-rest form (:func:`ivfpq_topk_at_rest`) skips the
    encode — this full-scan form exists as the layout-free baseline,
    exactly as ``srp_ann_topk`` does for the SRP index."""
    lut = adc_lut(query_vec, codebooks)
    coded = pq_encode(embeddings, codebooks, vec_col)
    scored = coded.select(
        F.col(id_col), F.round(_adc_score(lut, "pq_code"), 6).alias("adc_d2")
    )
    # asc_nulls_last: a null embedding encodes to a null score and must
    # sink, not float to rank 1 (Spark's asc default is NULLS FIRST)
    return scored.orderBy(
        F.col("adc_d2").asc_nulls_last(), F.col(id_col)
    ).limit(k)


def ivfpq_index_write(
    embeddings: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation: np.ndarray | None = None,
) -> None:
    """Persist the IVF-PQ layout: rows partitioned by coarse cell
    (``ivf_cell=<n>`` directories), carrying (id, pq_code, vector).
    Cell assignment and PQ encode both happen ONCE here; probes then
    read nprobe partitions of codes and touch raw vectors only for the
    re-rank survivors. Keeping the raw vector beside the code costs
    storage but buys exact re-ranking without a second table — at
    scale, parquet column pruning means ADC scans never read it.

    Pass ``rotation`` (an :func:`opq_train` R, trained together with
    ``codebooks``) for the OPQ layout: codes quantize the ROTATED
    vectors while the stored raw vector — and therefore the re-rank —
    stays in the original space (R is orthogonal, so L2 is identical
    in both). The coarse quantizer also stays in the original space:
    cell geometry and rotation are independent concerns."""
    from .similarity import ivf_assign

    assigned = ivf_assign(embeddings, centroids, vec_col)
    coded = (
        pq_encode(assigned, codebooks, vec_col)
        if rotation is None
        else opq_encode(assigned, rotation, codebooks, vec_col)
    )
    (
        coded.select(id_col, "pq_code", vec_col, "ivf_cell")
        .write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(path)
    )


def ivfpq_topk_at_rest(
    spark,
    index_path: str,
    query_vec: list[float],
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """Two-stage IVFADC search against a persisted
    :func:`ivfpq_index_write` layout (pass the index's ``rotation``
    for an OPQ layout — the LUT is then built from the ROTATED query,
    while coarse-cell ranking and the exact re-rank stay in the
    original space, where L2 is identical under the orthogonal R):

    1. rank the query's ``nprobe`` nearest coarse cells driver-side
       (O(n_cells)); scan ONLY those partitions (partition pruning —
       the plan's PartitionFilters prove it, tests/test_pq.py checks);
    2. ADC-rank the probed codes JVM-side (column pruning: this stage
       reads id + pq_code, never the vector column) and keep the top
       ``rerank`` by quantized distance — a per-partition k-heap
       (TakeOrderedAndProject), O(rerank) memory;
    3. exact-re-rank the survivors on their stored raw vectors and
       return the true-L2 top k (ties to the lowest id).

    Returns (id, l2_d2) — exact distances for the returned rows, so
    downstream thresholds mean what they say even though the candidate
    set is approximate."""
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((np.asarray(centroids, dtype=np.float64) - q[None, :]) ** 2).sum(
        axis=1
    )
    probes = [int(i) for i in d2.argsort()[:nprobe]]
    lut_q = (
        query_vec
        if rotation is None
        else [
            float(x)
            for x in q @ np.asarray(rotation, dtype=np.float64)
        ]
    )
    lut = adc_lut(lut_q, codebooks)
    idx = spark.read.parquet(index_path).where(
        F.col("ivf_cell").isin(probes)
    )
    cand = (
        idx.select(F.col(id_col), _adc_score(lut, "pq_code").alias("adc_d2"))
        .orderBy(F.col("adc_d2").asc_nulls_last(), F.col(id_col))
        .limit(rerank)
    )
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    # the survivor set is rerank rows by construction — broadcast it
    # so the re-rank join never shuffles the probed partitions
    exact = idx.join(F.broadcast(cand.select(id_col)), id_col).select(
        F.col(id_col),
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    qlit,
                    lambda x, y: (x.cast("double") - y)
                    * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("l2_d2"),
    )
    return exact.orderBy(
        F.col("l2_d2").asc_nulls_last(), F.col(id_col)
    ).limit(k)


# --- portable fixed-codebook twins (hash-exact oracle path) ----------------
#
# Codebooks are corpus rows id < n_codes, floor-quantized to integers;
# assignment and ADC run on exact integer arithmetic with ties to the
# lowest code — every step replays bit-for-bit in DuckDB SQL, giving
# the encode→LUT→ADC pipeline the cross-engine proof the trained
# entries (rows-only by necessity) cannot give. Same pattern as
# similarity.semantic_dedup_fixed_cells / dedup.minhash_lsh_portable.


def _fixed_subvectors(
    df: DataFrame,
    m: int,
    dsub: int,
    scale: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, sub_j, s): floor-quantized integer sub-vectors, exploded
    one row per (row, sub-vector) — the narrow frame every fixed-twin
    step joins on. floor, not round: round-half semantics differ
    across engines."""
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast(
            "long"
        ),
    )
    subs = F.array(
        *[
            F.struct(
                F.lit(j).alias("sub_j"),
                F.slice(qv, j * dsub + 1, dsub).alias("s"),
            )
            for j in range(m)
        ]
    )
    return df.select(F.col(id_col), F.explode(subs).alias("e")).select(
        id_col, F.col("e.sub_j").alias("sub_j"), F.col("e.s").alias("s")
    )


_INT_D2 = lambda a, b: F.aggregate(  # noqa: E731 — shared integer Σ(a−b)²
    F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
    F.lit(0).cast("long"),
    lambda acc, x: acc + x,
)


def pq_encode_fixed(
    embeddings: DataFrame,
    m: int = 4,
    n_codes: int = 8,
    scale: int = 1000,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Portable PQ encode: codebook j's code c is the floor-quantized
    j-th sub-vector of corpus row id == c (no training — at scale this
    would be any agreed codebook table); assignment is the integer
    squared distance argmin with ties to the lowest code. Returns the
    exploded (id, sub_j, code) frame — one row per sub-vector, all
    BIGINT, hash-exact across engines.

    Scale shape: the codebook frame is m·n_codes rows (broadcast);
    assignment is a broadcast join on sub_j (n·m·n_codes candidate
    rows — linear in the corpus for fixed m, n_codes) with a
    per-(id, sub_j) window over n_codes rows."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    sub = _fixed_subvectors(embeddings, m, dsub, scale, id_col, vec_col)
    cb = sub.where(F.col(id_col) < n_codes).select(
        F.col(id_col).alias("code"), F.col("sub_j"), F.col("s").alias("cs")
    )
    w = Window.partitionBy(id_col, "sub_j").orderBy("d2", "code")
    return (
        sub.join(F.broadcast(cb), "sub_j")
        .withColumn("d2", _INT_D2(F.col("s"), F.col("cs")))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col(id_col),
            F.col("sub_j").cast("long").alias("sub_j"),
            F.col("code").cast("long").alias("code"),
        )
    )


def pq_adc_topk_fixed(
    embeddings: DataFrame,
    query_id: int = 0,
    m: int = 4,
    n_codes: int = 8,
    scale: int = 1000,
    dim: int = 64,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Portable ADC top-k: the full encode→LUT→scan pipeline on exact
    integer arithmetic. The LUT is the join of the query row's
    quantized sub-vectors with the fixed codebook (m·n_codes rows —
    broadcast); each row's ADC distance is the SUM of its m looked-up
    entries (an equi-join on (sub_j, code) + groupBy, replacing the
    trained path's literal-array lookup with the same associative
    integer sum); top-k orders by (adc_d2, id). Returns (id, adc_d2),
    both BIGINT — bit-for-bit replayable by the DuckDB oracle."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    sub = _fixed_subvectors(embeddings, m, dsub, scale, id_col, vec_col)
    cb = sub.where(F.col(id_col) < n_codes).select(
        F.col(id_col).alias("code"), F.col("sub_j"), F.col("s").alias("cs")
    )
    qsub = sub.where(F.col(id_col) == query_id).select(
        F.col("sub_j"), F.col("s").alias("qs")
    )
    lut = (
        cb.join(qsub, "sub_j")
        .select(
            "sub_j", "code", _INT_D2(F.col("qs"), F.col("cs")).alias("lut_d2")
        )
    )
    codes = pq_encode_fixed(
        embeddings, m, n_codes, scale, dim, id_col, vec_col
    )
    scored = (
        codes.join(F.broadcast(lut), ["sub_j", "code"])
        .groupBy(id_col)
        .agg(F.sum("lut_d2").alias("adc_d2"))
    )
    return scored.orderBy(F.col("adc_d2").asc(), F.col(id_col)).limit(k)


# --- OPQ: optimized product quantization (learned rotation) ---------------


def opq_train(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    sample_rows: int = 512,
    opq_iters: int = 8,
    kmeans_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """Train an OPQ rotation + codebooks (Ge et al., "Optimized
    Product Quantization", CVPR 2013): alternate between (a) fitting
    PQ codebooks to the rotated sample and (b) solving the orthogonal
    Procrustes problem ``min_R ||XR − Y||`` for the rotation that
    best aligns the data with its quantized reconstruction Y
    (R = UVᵀ from the SVD of XᵀY). Plain PQ quantizes axis-aligned
    sub-vectors, which wastes codebook capacity when variance is
    unevenly spread or correlated across the sub-vector cut points;
    the learned rotation redistributes it. Returns ``(R, codebooks)``
    — both driver-space artifacts (dim×dim + m·n_codes·dsub doubles),
    trained on the same bounded deterministic sample as
    :func:`pq_train_codebooks`. tests/test_pq.py pins that OPQ's
    sample reconstruction error is ≤ plain PQ's."""
    sample = np.asarray(
        [
            [float(x) for x in r[0]]
            for r in embeddings.select(vec_col)
            .orderBy(id_col)
            .limit(sample_rows)
            .collect()
        ],
        dtype=np.float64,
    )
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(SEED)
    R = np.eye(dim)
    books = None
    for _ in range(opq_iters):
        X = sample @ R
        books = np.empty((m, n_codes, dsub), dtype=np.float64)
        for j in range(m):
            sub = X[:, j * dsub : (j + 1) * dsub]
            cents = sub[rng.choice(len(sub), n_codes, replace=False)].copy()
            for _ in range(kmeans_iters):
                d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(
                    axis=2
                )
                assign = d2.argmin(axis=1)
                for c in range(n_codes):
                    members = sub[assign == c]
                    if len(members):
                        cents[c] = members.mean(axis=0)
            books[j] = cents
        # quantized reconstruction under the current rotation
        Y = np.empty_like(X)
        for j in range(m):
            sub = X[:, j * dsub : (j + 1) * dsub]
            stat = -2.0 * (sub @ books[j].T) + (books[j] ** 2).sum(axis=1)[
                None, :
            ]
            Y[:, j * dsub : (j + 1) * dsub] = books[j][
                stat.argmin(axis=1)
            ]
        # orthogonal Procrustes: R aligning the ORIGINAL sample to Y
        U, _, Vt = np.linalg.svd(sample.T @ Y)
        R = U @ Vt
    return R, books


def _rotated(df: DataFrame, R: np.ndarray, vec_col: str) -> DataFrame:
    """Apply the OPQ rotation as one Arrow matmul per batch, emitting
    a rotated double vector column ``__rot`` (encode-time only — the
    ADC scan never touches vectors)."""
    from pyspark.sql.functions import pandas_udf

    Rm = np.asarray(R, dtype=np.float64)

    @pandas_udf("array<double>")
    def _rot(v: pd.Series) -> pd.Series:
        mask = v.notna().to_numpy()
        out = [None] * len(v)
        if mask.any():
            x = np.vstack(v[mask].to_numpy()).astype(np.float64)
            y = x @ Rm
            for row, i in enumerate(np.flatnonzero(mask)):
                out[i] = [float(z) for z in y[row]]
        return pd.Series(out, dtype=object)

    return df.withColumn("__rot", _rot(F.col(vec_col)))


def opq_encode(
    df: DataFrame,
    R: np.ndarray,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """PQ-encode under the learned rotation: rotate (Arrow matmul),
    then the standard sub-vector argmin. Same output contract as
    :func:`pq_encode`; the rotation lives entirely at index-build
    time — scans and LUTs are unchanged."""
    return pq_encode(
        _rotated(df, R, vec_col), codebooks, "__rot", out_col
    ).drop("__rot")


def opq_topk_adc(
    embeddings: DataFrame,
    query_vec: list[float],
    R: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k under OPQ: the query rotates driver-side (rotation
    is orthogonal, so L2 distances in rotated space equal those in
    the original space) and the scan is byte-for-byte the PQ ADC
    scan over the rotated codes."""
    q = (
        np.asarray(query_vec, dtype=np.float64)
        @ np.asarray(R, dtype=np.float64)
    )
    lut = adc_lut([float(x) for x in q], codebooks)
    coded = opq_encode(embeddings, R, codebooks, vec_col)
    scored = coded.select(
        F.col(id_col), F.round(_adc_score(lut, "pq_code"), 6).alias("adc_d2")
    )
    return scored.orderBy(
        F.col("adc_d2").asc_nulls_last(), F.col(id_col)
    ).limit(k)
