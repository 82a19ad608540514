"""Product-quantization query catalog over the ``embeddings`` table.

Four entries tell the whole IVFADC story: two fixed-codebook twins
give the encode→LUT→ADC pipeline a hash-exact cross-engine oracle
(integer arithmetic end to end — the ``semantic_dedup_fixed_cells``
pattern), and two trained entries are the production shapes (k-means
codebooks + coarse quantizer; rows-only by necessity, recall bounds in
tests/test_pq.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
