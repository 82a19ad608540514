"""Product-quantization query catalog over the ``embeddings`` table.

Four entries tell the whole IVFADC story: two fixed-codebook twins
give the encode→LUT→ADC pipeline a hash-exact cross-engine oracle
(integer arithmetic end to end — the ``semantic_dedup_fixed_cells``
pattern), and two trained entries are the production shapes (k-means
codebooks + coarse quantizer; rows-only by necessity, recall bounds in
tests/test_pq.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import pq as PQ
from ..operators import similarity as S
from ..sources.tables import load_table
from .registry import register
from .simplans import _query_vector

# Shared CTE prefix: floor-quantized integer sub-vectors (m=4 × 16 of
# the 64-dim vectors, scale 1000) and the fixed codebook = corpus rows
# vec_id < 8 — bit-for-bit the frames operators.pq._fixed_subvectors
# builds.
_FIXED_PREFIX = """
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      FROM embeddings
    ), sub AS (
      SELECT vec_id, j.sub_j AS sub_j,
             list_slice(qv, j.sub_j * 16 + 1, (j.sub_j + 1) * 16) AS s
      FROM q CROSS JOIN (SELECT unnest(range(4)) AS sub_j) j
    ), cb AS (
      SELECT vec_id AS code, sub_j, s AS cs FROM sub WHERE vec_id < 8
    ), d AS (
      SELECT sub.vec_id, sub.sub_j, cb.code,
             list_sum(list_transform(list_zip(sub.s, cb.cs),
               z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d2
      FROM sub JOIN cb ON sub.sub_j = cb.sub_j
    ), codes AS (
      SELECT vec_id, sub_j, code FROM (
        SELECT vec_id, sub_j, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub_j
                                  ORDER BY d2, code) AS rn
        FROM d) r
      WHERE rn = 1
    )
"""


@register(
    "pq_encode_fixed_embeddings",
    oracle=_FIXED_PREFIX
    + """
    SELECT vec_id, CAST(sub_j AS BIGINT) AS sub_j,
           CAST(code AS BIGINT) AS code
    FROM codes
    """,
)
def pq_encode_fixed_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable PQ encode (operators.pq.pq_encode_fixed): codebook j's
    code c = the floor-quantized j-th sub-vector of corpus row c;
    assignment by exact integer Σ(a−b)² argmin, ties to the lowest
    code. One (id, sub_j, code) row per sub-vector, all BIGINT —
    the hash-exact cross-engine proof of PQ encoding that the trained
    entry (rows-only) cannot give."""
    emb = load_table(spark, sf_dir, "embeddings")
    return PQ.pq_encode_fixed(emb, m=4, n_codes=8, scale=1000, dim=64)


@register(
    "pq_adc_topk_fixed",
    oracle=_FIXED_PREFIX
    + """
    , lut AS (
      SELECT cb.sub_j, cb.code,
             list_sum(list_transform(list_zip(qq.qs, cb.cs),
               z -> (z[1] - z[2]) * (z[1] - z[2]))) AS lut_d2
      FROM cb JOIN (SELECT sub_j, s AS qs FROM sub WHERE vec_id = 0) qq
        ON cb.sub_j = qq.sub_j
    )
    SELECT c.vec_id, CAST(SUM(lut.lut_d2) AS BIGINT) AS adc_d2
    FROM codes c JOIN lut ON c.sub_j = lut.sub_j AND c.code = lut.code
    GROUP BY c.vec_id
    ORDER BY adc_d2, c.vec_id
    LIMIT 10
    """,
)
def pq_adc_topk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable ADC top-10 (operators.pq.pq_adc_topk_fixed): the full
    encode→LUT→asymmetric-distance scan on exact integer arithmetic —
    the LUT is the query row's quantized sub-vectors joined to the
    fixed codebook, each row's distance is the sum of its m looked-up
    entries, top-k ordered by (adc_d2, vec_id). Every step replayed
    bit-for-bit by the DuckDB oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    return PQ.pq_adc_topk_fixed(
        emb, query_id=0, m=4, n_codes=8, scale=1000, dim=64, k=10
    )


@register("pq_ann_topk_adc")  # trained codebooks: no SQL equivalent
def pq_ann_topk_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-10 with trained codebooks (m=8 sub-vectors × 16 codes,
    per-sub-vector k-means on a deterministic sample): encode once,
    then the scan ranks by m pure-JVM literal-array lookups per row —
    per-row query cost independent of vector dimension. Rows-only
    (quantized ranking); tests/test_pq.py pins recall vs exact L2 and
    LUT/encode exactness."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    books = PQ.pq_train_codebooks(emb, m=8, n_codes=16)
    return PQ.pq_topk_adc(emb, q, books, k=10)


#: Per-process cache of built IVF-PQ layouts: sf_dir -> (path,
#: centroids, codebooks). Written once (the index-build cost), every
#: probe reuses it — the point of codes-at-rest.
_IVFPQ_INDEX: dict[str, tuple] = {}


def ivfpq_index_path(spark: SparkSession, sf_dir: str):
    """Build (once) and return the persisted IVF-PQ layout + its
    trained coarse centroids and PQ codebooks for sf_dir."""
    if sf_dir not in _IVFPQ_INDEX:
        import tempfile

        emb = load_table(spark, sf_dir, "embeddings")
        centroids = S.ivf_train_centroids(emb, n_cells=16)
        books = PQ.pq_train_codebooks(emb, m=8, n_codes=16)
        path = tempfile.mkdtemp(prefix="ivfpq_index_") + "/embeddings"
        PQ.ivfpq_index_write(emb, centroids, books, path)
        _IVFPQ_INDEX[sf_dir] = (path, centroids, books)
    return _IVFPQ_INDEX[sf_dir]


@register("ivfpq_ann_topk_at_rest")  # trained quantizers: no SQL form
def ivfpq_ann_topk_at_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage IVFADC search against the persisted ivf_cell=<n>
    code layout: probe nprobe=4 of 16 partitions (partition pruning),
    ADC-rank the probed codes JVM-side reading only (vec_id, pq_code)
    via column pruning, exact-re-rank the top-64 survivors on their
    stored raw vectors. Returns exact L2 distances for the final 10.
    Rows-only; tests/test_pq.py pins recall, the pruned scan shape,
    and re-rank exactness."""
    q = _query_vector(spark, sf_dir, 0)
    path, centroids, books = ivfpq_index_path(spark, sf_dir)
    return PQ.ivfpq_topk_at_rest(
        spark, path, q, centroids, books, k=10, nprobe=4, rerank=64
    )


@register("opq_ann_topk_adc")  # learned rotation + codebooks: no SQL form
def opq_ann_topk_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-10 under OPQ (Ge et al. 2013): a learned orthogonal
    rotation redistributes variance across the sub-vector cut points
    before quantization (alternating codebook fit / orthogonal
    Procrustes on the training sample), then the scan is byte-for-byte
    the PQ ADC scan — rotation cost lives only at index build and in
    the driver-side query prep. Rows-only; tests/test_pq.py pins that
    OPQ's reconstruction error ≤ plain PQ's on the training sample and
    encode parity with a numpy reference."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    R, books = PQ.opq_train(emb, m=8, n_codes=16)
    return PQ.opq_topk_adc(emb, q, R, books, k=10)


# Shared CTE prefix for the OPQ fixed twin: the deterministic integer
# rotation W[i][j] = ((i*37 + j*23 + i*j*29) % 101) - 50
# (operators.pq._opq_fixed_rotation — full rank 64, unlike the
# rank-7-circulant pca formula, so the ADC top-10 is tie-free and the
# oracle pins ranking, not just tie-breaking), applied to the
# floor-quantized vectors; m=8 × 8-dim rotated sub-vectors; fixed
# codebook = rotated sub-vectors of corpus rows vec_id < 8; query row
# 33 (not a codebook row, so every LUT entry is nonzero).
_OPQ_FIXED_ORACLE = """
    WITH q AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      FROM embeddings
    ), dims AS (SELECT unnest(range(64)) AS j),
    w AS MATERIALIZED (
      SELECT ii.i, dims.j,
             CAST(((ii.i*37 + dims.j*23 + ii.i*dims.j*29) % 101) - 50
               AS BIGINT) AS w
      FROM (SELECT unnest(range(64)) AS i) ii CROSS JOIN dims
    ), rot AS MATERIALIZED (
      SELECT q.vec_id, w.i, CAST(SUM(q.qv[w.j+1] * w.w) AS BIGINT) AS rv
      FROM q CROSS JOIN w GROUP BY q.vec_id, w.i
    ), sub AS (SELECT vec_id, i // 8 AS sub_j, i % 8 AS p, rv FROM rot),
    cb AS (SELECT vec_id AS code, sub_j, p, rv AS cs
           FROM sub WHERE vec_id < 8),
    d AS MATERIALIZED (
      SELECT s.vec_id, s.sub_j, cb.code,
             SUM((s.rv - cb.cs)*(s.rv - cb.cs)) AS d2
      FROM sub s JOIN cb ON s.sub_j = cb.sub_j AND s.p = cb.p
      GROUP BY s.vec_id, s.sub_j, cb.code
    ), codes AS (
      SELECT vec_id, sub_j, code FROM (
        SELECT vec_id, sub_j, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub_j
                                  ORDER BY d2, code) AS rn
        FROM d) r
      WHERE rn = 1
    ), lut AS (SELECT sub_j, code, d2 AS lut_d2 FROM d WHERE vec_id = 33)
    SELECT c.vec_id, CAST(SUM(l.lut_d2) AS BIGINT) AS adc_d2
    FROM codes c JOIN lut l ON c.sub_j = l.sub_j AND c.code = l.code
    GROUP BY c.vec_id
    ORDER BY adc_d2, c.vec_id LIMIT 10
    """


@register("opq_ann_topk_fixed", oracle=_OPQ_FIXED_ORACLE)
def opq_ann_topk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable hash-exact twin of the OPQ pipeline
    (operators.pq.opq_adc_topk_fixed — VERDICT r15 #1): the learned
    orthogonal rotation is replaced by a deterministic full-rank
    integer matrix applied to floor-quantized vectors, and the
    pipeline is then byte-for-byte the PQ fixed ADC over the rotated
    coordinates (mirroring how opq_topk_adc IS pq_topk_adc over
    rotated vectors). Pins rotate→encode→LUT→ADC end to end, leaving
    only the Procrustes fit itself to the rows-only entry."""
    emb = load_table(spark, sf_dir, "embeddings")
    return PQ.opq_adc_topk_fixed(
        emb, query_id=33, m=8, n_codes=8, scale=1000, dim=64, k=10
    )


# The IVF-PQ fixed twin's oracle: two-stage IVFADC with BOTH
# quantizers fixed — coarse centroids = floor-quantized corpus rows
# vec_id < 8 (integer d2 argmin, ties to the lowest cell), PQ codebook
# = sub-vectors of rows vec_id < 8 (m=4 × 16), query row 0, nprobe=2,
# rerank=16, then exact integer full-dimension re-rank.
_IVFPQ_FIXED_ORACLE = """
    WITH q AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      FROM embeddings
    ), cents AS (SELECT vec_id AS cell, qv AS cq FROM q WHERE vec_id < 8),
    qq AS (SELECT qv AS query_qv FROM q WHERE vec_id = 0),
    asg AS MATERIALIZED (
      SELECT vec_id, qv, cell FROM (
        SELECT q.vec_id, q.qv, c.cell,
               list_sum(list_transform(list_zip(q.qv, c.cq),
                 z -> (z[1]-z[2])*(z[1]-z[2]))) AS d2
        FROM q CROSS JOIN cents c) t
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY d2, cell) = 1
    ), probes AS (
      SELECT cell FROM (
        SELECT c.cell,
               list_sum(list_transform(list_zip(c.cq, qq.query_qv),
                 z -> (z[1]-z[2])*(z[1]-z[2]))) AS d2
        FROM cents c CROSS JOIN qq) t
      ORDER BY d2, cell LIMIT 2
    ), cand AS (SELECT a.vec_id, a.qv FROM asg a JOIN probes USING (cell)),
    sub AS MATERIALIZED (
      SELECT vec_id, j.sub_j AS sub_j,
             list_slice(qv, j.sub_j * 16 + 1, (j.sub_j + 1) * 16) AS s
      FROM q CROSS JOIN (SELECT unnest(range(4)) AS sub_j) j
    ), cb AS (SELECT vec_id AS code, sub_j, s AS cs
              FROM sub WHERE vec_id < 8),
    lut AS (
      SELECT cb.sub_j, cb.code,
             list_sum(list_transform(list_zip(qs.s, cb.cs),
               z -> (z[1]-z[2])*(z[1]-z[2]))) AS lut_d2
      FROM cb JOIN (SELECT sub_j, s FROM sub WHERE vec_id = 0) qs
        USING (sub_j)
    ), csub AS (SELECT sub.* FROM sub JOIN cand USING (vec_id)),
    codes AS (
      SELECT vec_id, sub_j, code FROM (
        SELECT s.vec_id, s.sub_j, cb.code,
               list_sum(list_transform(list_zip(s.s, cb.cs),
                 z -> (z[1]-z[2])*(z[1]-z[2]))) AS d2
        FROM csub s JOIN cb USING (sub_j)) t
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, sub_j
                                 ORDER BY d2, code) = 1
    ), survivors AS (
      SELECT c.vec_id
      FROM codes c JOIN lut l ON c.sub_j = l.sub_j AND c.code = l.code
      GROUP BY c.vec_id
      ORDER BY CAST(SUM(l.lut_d2) AS BIGINT), c.vec_id LIMIT 16
    )
    SELECT cand.vec_id,
           CAST(list_sum(list_transform(list_zip(cand.qv, qq.query_qv),
             z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS qd2
    FROM cand JOIN survivors USING (vec_id) CROSS JOIN qq
    ORDER BY qd2, cand.vec_id LIMIT 10
    """


@register("ivfpq_ann_topk_fixed", oracle=_IVFPQ_FIXED_ORACLE)
def ivfpq_ann_topk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable hash-exact twin of the TWO-STAGE IVFADC search
    (operators.pq.ivfpq_topk_fixed — VERDICT r15 #1): coarse cell
    probe (fixed integer centroids, nprobe=2 of 8), fixed-codebook
    ADC rank with a deterministic rerank=16 cut, exact integer
    full-dimension re-rank to top-10. One oracle replays all three
    stages in a single statement — the cross-engine proof the trained
    ivfpq entry (rows-only: k-means + float LUT) cannot give."""
    emb = load_table(spark, sf_dir, "embeddings")
    return PQ.ivfpq_topk_fixed(
        emb,
        query_id=0,
        m=4,
        n_codes=8,
        n_cells=8,
        nprobe=2,
        rerank=16,
        scale=1000,
        dim=64,
        k=10,
    )


#: Per-process cache of built IVF-PQ lifecycle trees: sf_dir -> path.
_IVFPQ_INC_INDEX: dict[str, str] = {}


@register("ivfpq_ann_topk_incremental")  # trained quantizers: no SQL form
def ivfpq_ann_topk_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN served from an INCREMENTALLY-built lifecycle tree
    (operators.pq.ivfpq_index_append — VERDICT r15 #1, the last index
    family to gain O(batch) appends): batch 0 (even vec_ids) trains
    and freezes BOTH quantizers (coarse centroids + PQ codebooks) in
    the tree; batch 1 (odd ids) assigns and encodes against the
    stored artifacts. The probe (ivfpq_index_topk) is SELF-CONTAINED:
    it reads quantizers from the index, prunes nprobe=4 of 16
    ivf_cell= partitions across batches, ADC-ranks codes (column
    pruning — no vector read), folds re-delivered ids latest-wins
    over the pruned slice (skipped for manifest-proven disjoint
    batches), and exact-re-ranks the top-64 survivors. Rows-only
    (quantized candidate set); lifecycle equality/recall pinned in
    tests/test_pq.py."""
    if sf_dir not in _IVFPQ_INC_INDEX:
        import tempfile

        emb = load_table(spark, sf_dir, "embeddings")
        path = tempfile.mkdtemp(prefix="ivfpq_inc_") + "/embeddings"
        PQ.ivfpq_index_append(
            emb.where(F.col("vec_id") % 2 == 0), path, 0, m=8, n_codes=16,
            n_cells=16,
        )
        PQ.ivfpq_index_append(
            emb.where(F.col("vec_id") % 2 == 1), path, 1, m=8, n_codes=16,
            n_cells=16,
        )
        _IVFPQ_INC_INDEX[sf_dir] = path
    q = _query_vector(spark, sf_dir, 0)
    return PQ.ivfpq_index_topk(
        spark, _IVFPQ_INC_INDEX[sf_dir], q, k=10, nprobe=4, rerank=64
    )


#: Per-process cache of built OPQ-IVF-PQ lifecycle trees.
_OPQ_INC_INDEX: dict[str, str] = {}


@register("opq_ann_topk_incremental")  # learned rotation: no SQL form
def opq_ann_topk_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ-IVF-PQ ANN served from an INCREMENTALLY-built lifecycle
    tree (operators.pq.ivfpq_index_append(opq=True) — round 16,
    completing the OPQ story's lifecycle leg): batch 0 (even vec_ids)
    trains and freezes the coarse centroids, the LEARNED ROTATION,
    and the rotated-space codebooks in the tree; batch 1 (odd ids)
    rotates+encodes against the stored artifacts. The probe reads the
    opq flag from meta, builds its ADC LUT from the ROTATED query,
    and coarse-ranks + exact-re-ranks in the original space (L2
    identical under the orthogonal R). Mixing flavors raises (codes
    from the two spaces are incomparable under one LUT). Rows-only
    (Procrustes rotation + k-means); lifecycle equality pinned in
    tests/test_pq.py."""
    if sf_dir not in _OPQ_INC_INDEX:
        import tempfile

        emb = load_table(spark, sf_dir, "embeddings")
        path = tempfile.mkdtemp(prefix="opq_inc_") + "/embeddings"
        PQ.ivfpq_index_append(
            emb.where(F.col("vec_id") % 2 == 0), path, 0, m=8,
            n_codes=16, n_cells=16, opq=True,
        )
        PQ.ivfpq_index_append(
            emb.where(F.col("vec_id") % 2 == 1), path, 1, m=8,
            n_codes=16, n_cells=16, opq=True,
        )
        _OPQ_INC_INDEX[sf_dir] = path
    q = _query_vector(spark, sf_dir, 0)
    return PQ.ivfpq_index_topk(
        spark, _OPQ_INC_INDEX[sf_dir], q, k=10, nprobe=4, rerank=64
    )


#: Per-process cache of built OPQ at-rest layouts:
#: sf_dir -> (path, centroids, R, codebooks).
_OPQ_AT_REST: dict[str, tuple] = {}


@register("opq_ann_topk_at_rest")  # learned rotation: no SQL form
def opq_ann_topk_at_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage IVFADC search against the persisted OPQ layout
    (operators.pq.ivfpq_index_write(rotation=R) /
    ivfpq_topk_at_rest(rotation=R) — round 16, the at-rest serving
    shape of the OPQ family; `opq_ann_topk_adc` is its full-scan
    ad-hoc baseline): codes quantize the ROTATED vectors at write
    time, the probe builds its ADC LUT from the rotated query, and
    coarse-cell ranking + the exact re-rank stay in the original
    space (L2 identical under the orthogonal R). Partition pruning on
    ivf_cell=, column pruning in the ADC stage — the same plan
    contract as ivfpq_ann_topk_at_rest, pytested there. Rows-only;
    recall/exactness bounds in tests/test_pq.py."""
    q = _query_vector(spark, sf_dir, 0)
    if sf_dir not in _OPQ_AT_REST:
        import tempfile

        emb = load_table(spark, sf_dir, "embeddings")
        centroids = S.ivf_train_centroids(emb, n_cells=16)
        R, books = PQ.opq_train(emb, m=8, n_codes=16)
        path = tempfile.mkdtemp(prefix="opq_at_rest_") + "/embeddings"
        PQ.ivfpq_index_write(emb, centroids, books, path, rotation=R)
        _OPQ_AT_REST[sf_dir] = (path, centroids, R, books)
    path, centroids, R, books = _OPQ_AT_REST[sf_dir]
    return PQ.ivfpq_topk_at_rest(
        spark, path, q, centroids, books, k=10, nprobe=4, rerank=64,
        rotation=R,
    )
