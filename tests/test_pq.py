"""Product-quantization family: encode exactness vs a numpy reference,
ADC LUT/scoring exactness, recall bounds (fixture floor + planted
clusters where PQ should genuinely shine), IVF-PQ at-rest partition
pruning and re-rank exactness, and the fixed-twin DuckDB oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.operators.pq import (
    adc_lut,
    ivfpq_index_write,
    ivfpq_topk_at_rest,
    pq_encode,
    pq_topk_adc,
    pq_train_codebooks,
)
from pyspark_airflow_weather_etl_spark.operators.similarity import (
    ivf_train_centroids,
)
from pyspark_airflow_weather_etl_spark.sources.tables import load_table

from conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def xmat(emb):
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, X


@pytest.fixture(scope="module")
def qvec(xmat):
    ids, X = xmat
    return [float(x) for x in X[list(ids).index(0)]]


@pytest.fixture(scope="module")
def books(emb):
    return pq_train_codebooks(emb, m=8, n_codes=16)


def _numpy_codes(X, books):
    m, n_codes, dsub = books.shape
    codes = np.empty((X.shape[0], m), dtype=np.int64)
    for j in range(m):
        sub = X[:, j * dsub : (j + 1) * dsub]
        stat = -2.0 * (sub @ books[j].T) + (books[j] ** 2).sum(axis=1)[None, :]
        codes[:, j] = stat.argmin(axis=1)
    return codes


def test_encode_matches_numpy(emb, xmat, books):
    """Distributed Arrow encode == per-row numpy argmin, every row."""
    ids, X = xmat
    want = {int(i): c.tolist() for i, c in zip(ids, _numpy_codes(X, books))}
    got = {
        r.vec_id: list(r.pq_code)
        for r in pq_encode(emb, books).select("vec_id", "pq_code").collect()
    }
    assert got == want


def test_adc_lut_and_score_exact(emb, xmat, qvec, books):
    """The JVM literal-lookup score equals the numpy LUT sum (6 dp) —
    the ADC scan is exact given the codes; all approximation lives in
    the quantization itself."""
    ids, X = xmat
    lut = adc_lut(qvec, books)
    codes = _numpy_codes(X, books)
    want_all = {
        int(i): round(float(lut[np.arange(books.shape[0]), c].sum()), 6)
        for i, c in zip(ids, codes)
    }
    got = pq_topk_adc(emb, qvec, books, k=500).collect()
    assert len(got) == len(ids)
    for r in got:
        assert abs(r.adc_d2 - want_all[r.vec_id]) <= 1e-6


def test_fixture_recall_floor(emb, xmat, qvec, books):
    """Fixture embeddings are near-uniform-distance (the ANN worst
    case); the deterministic floor guards the plumbing. ADC alone
    lands 0.4 recall@10 here; all of its top-10 sit inside the exact
    top-50 — quantized ranking is coarse, not wrong."""
    ids, X = xmat
    q = np.asarray(qvec)
    d2 = ((X - q[None, :]) ** 2).sum(axis=1)
    order = np.argsort(d2, kind="stable")
    top10 = set(int(i) for i in ids[order[:10]])
    top50 = set(int(i) for i in ids[order[:50]])
    approx = {r.vec_id for r in pq_topk_adc(emb, qvec, books, k=10).collect()}
    assert len(approx & top10) / 10 >= 0.3
    assert len(approx & top50) / 10 >= 0.6


def test_planted_cluster_recall(spark):
    """Where the data has cluster structure (the real-corpus case), a
    16-dim m=4 PQ separates clusters cleanly: the query's planted
    near-copies must dominate the ADC top-k."""
    rng = np.random.default_rng(7)
    dim, n_base, n_copies = 16, 60, 9
    base = rng.standard_normal((n_base, dim)) * 3.0
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # plant near-copies of base[0] with ids ≥ 1000
    for c in range(n_copies):
        v = base[0] + 0.05 * rng.standard_normal(dim)
        rows.append((1000 + c, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq_train_codebooks(df, m=4, n_codes=16, sample_rows=128)
    got = {
        r.vec_id
        for r in pq_topk_adc(
            df, [float(x) for x in base[0]], books, k=n_copies + 1
        ).collect()
    }
    planted = {0} | {1000 + c for c in range(n_copies)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.9, f"planted recall {recall}"


def test_encode_tie_breaks_to_lowest_code(spark):
    """Two identical codebook rows ⇒ exact tie ⇒ the lower code wins
    (matching numpy argmin's first-hit rule the reference uses)."""
    books = np.zeros((1, 4, 2))
    books[0, 1] = [1.0, 1.0]
    books[0, 2] = [1.0, 1.0]  # identical to code 1
    books[0, 3] = [9.0, 9.0]
    df = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [0.1, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: list(r.pq_code) for r in pq_encode(df, books).collect()
    }
    assert got == {0: [1], 1: [0]}


class TestIvfPqAtRest:
    @pytest.fixture(scope="class")
    def index(self, emb, books, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("ivfpq") / "embeddings")
        cents = ivf_train_centroids(emb, n_cells=16)
        ivfpq_index_write(emb, cents, books, path)
        return path, cents

    def test_partition_pruning_and_rerank_exact(
        self, spark, emb, xmat, qvec, books, index
    ):
        """The probe plan must prune to the nprobe cells (PartitionFilters
        on ivf_cell), and the returned l2_d2 must equal the true squared
        distance computed by numpy — re-ranking is exact."""
        path, cents = index
        got = ivfpq_topk_at_rest(
            spark, path, qvec, cents, books, k=10, nprobe=4, rerank=64
        )
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "ivf_cell" in plan  # pruned scan, not a full read
        ids, X = xmat
        q = np.asarray(qvec)
        d2 = {int(i): float(((x - q) ** 2).sum()) for i, x in zip(ids, X)}
        rows = got.collect()
        assert len(rows) == 10
        for r in rows:
            assert abs(r.l2_d2 - round(d2[r.vec_id], 6)) <= 1e-6

    def test_recall_beats_adc_alone(self, spark, emb, xmat, qvec, books, index):
        """Exact re-ranking of the ADC top-64 within probed cells must
        reach the 0.5 recall@10 the raw ADC ranking cannot (measured
        0.7 vs 0.4 on the fixture)."""
        path, cents = index
        ids, X = xmat
        q = np.asarray(qvec)
        d2 = ((X - q[None, :]) ** 2).sum(axis=1)
        top10 = set(int(i) for i in ids[np.argsort(d2, kind="stable")[:10]])
        got = {
            r.vec_id
            for r in ivfpq_topk_at_rest(
                spark, path, qvec, cents, books, k=10, nprobe=4, rerank=64
            ).collect()
        }
        assert len(got & top10) / 10 >= 0.5


def test_fixed_twin_matches_duckdb(spark, emb, duck):
    """The portable twin replays bit-for-bit in DuckDB — the same
    check the correctness driver runs, kept here so a refactor can't
    silently break the oracle contract between rounds."""
    from pyspark_airflow_weather_etl_spark.plans import REGISTRY

    for name in ["pq_encode_fixed_embeddings", "pq_adc_topk_fixed"]:
        q = REGISTRY[name]
        got = q.fn(spark, SF_DIR).toPandas()
        got = got[sorted(got.columns)].sort_values(
            by=sorted(got.columns), ignore_index=True
        )
        want = duck.execute(q.oracle).fetchdf()
        want = want[sorted(want.columns)].sort_values(
            by=sorted(want.columns), ignore_index=True
        )
        assert got.equals(want), name


def test_null_embedding_sinks_not_ranks_first(spark, books):
    """A null embedding encodes to a null ADC score and must not
    occupy rank 1 (Spark's asc default is NULLS FIRST)."""
    rows = [(0, [0.0] * 64), (1, None), (2, [0.1] * 64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [r.vec_id for r in pq_topk_adc(df, [0.0] * 64, books, k=2).collect()]
    assert 1 not in got


class TestOpq:
    def test_rotation_is_orthogonal_and_reduces_error(self, emb, xmat):
        """The trained R must be orthogonal (distances preserved), and
        OPQ's quantized-reconstruction error on the training sample
        must not exceed plain PQ's — the entire point of the learned
        rotation (Ge et al. 2013)."""
        from pyspark_airflow_weather_etl_spark.operators.pq import (
            opq_train,
            pq_train_codebooks,
        )

        ids, X = xmat
        m, n_codes = 8, 16
        R, books_opq = opq_train(emb, m=m, n_codes=n_codes)
        assert np.allclose(R @ R.T, np.eye(R.shape[0]), atol=1e-9)
        books_pq = pq_train_codebooks(emb, m=m, n_codes=n_codes)
        sample = X[np.argsort(ids, kind="stable")][:512].astype(np.float64)
        dsub = sample.shape[1] // m

        def recon_err(S, books):
            err = 0.0
            for j in range(m):
                sub = S[:, j * dsub : (j + 1) * dsub]
                stat = -2.0 * (sub @ books[j].T) + (books[j] ** 2).sum(
                    axis=1
                )[None, :]
                err += (
                    (sub - books[j][stat.argmin(axis=1)]) ** 2
                ).sum()
            return err

        err_pq = recon_err(sample, books_pq)
        err_opq = recon_err(sample @ R, books_opq)
        assert err_opq <= err_pq, (err_opq, err_pq)

    def test_opq_encode_matches_numpy(self, spark, emb, xmat):
        from pyspark_airflow_weather_etl_spark.operators.pq import (
            opq_encode,
            opq_train,
        )

        ids, X = xmat
        R, books = opq_train(emb, m=8, n_codes=16)
        want = {
            int(i): c.tolist()
            for i, c in zip(ids, _numpy_codes(X @ R, books))
        }
        got = {
            r.vec_id: list(r.pq_code)
            for r in opq_encode(emb, R, books)
            .select("vec_id", "pq_code")
            .collect()
        }
        assert got == want

    def test_opq_topk_runs_and_respects_metric(self, emb, xmat, qvec):
        """Rotation is orthogonal ⇒ rotated-space ADC approximates the
        SAME L2 metric; the self-query must rank itself first."""
        from pyspark_airflow_weather_etl_spark.operators.pq import (
            opq_topk_adc,
            opq_train,
        )

        R, books = opq_train(emb, m=8, n_codes=16)
        rows = opq_topk_adc(emb, qvec, R, books, k=10).collect()
        assert len(rows) == 10
        assert rows[0].vec_id == 0  # the query row itself


def test_opq_at_rest_layout(spark, emb, xmat, qvec, tmp_path):
    """OPQ inside the at-rest IVF-PQ layout: codes quantize rotated
    vectors, coarse cells and the exact re-rank stay in the original
    space (orthogonal R preserves L2). Re-ranked distances must be
    exact, and recall@10 at least matches the plain-PQ layout's 0.5
    floor."""
    from pyspark_airflow_weather_etl_spark.operators.pq import (
        ivfpq_index_write,
        ivfpq_topk_at_rest,
        opq_train,
    )
    from pyspark_airflow_weather_etl_spark.operators.similarity import (
        ivf_train_centroids,
    )

    R, books = opq_train(emb, m=8, n_codes=16)
    cents = ivf_train_centroids(emb, n_cells=16)
    path = str(tmp_path / "opq_index")
    ivfpq_index_write(emb, cents, books, path, rotation=R)
    got = ivfpq_topk_at_rest(
        spark, path, qvec, cents, books, k=10, nprobe=4, rerank=64,
        rotation=R,
    ).collect()
    ids, X = xmat
    q = np.asarray(qvec)
    d2 = {int(i): float(((x - q) ** 2).sum()) for i, x in zip(ids, X)}
    assert len(got) == 10
    for r in got:
        assert abs(r.l2_d2 - round(d2[r.vec_id], 6)) <= 1e-6
    full = ((X - q[None, :]) ** 2).sum(axis=1)
    top10 = set(int(i) for i in ids[np.argsort(full, kind="stable")[:10]])
    assert len({r.vec_id for r in got} & top10) / 10 >= 0.5


def test_opq_fixed_twin_full_rank_and_distinct_topk(spark, emb, duck):
    """The OPQ fixed twin's rotation must stay full-rank (the pca
    fixed_rotation formula is circulant with period 7 — rank ≤ 7 —
    which collapses the rotated space into one giant ADC tie, a proof
    of tie-breaking rather than ranking) and the registered entry's
    top-10 must be tie-free so the oracle pins actual ADC ordering."""
    from pyspark_airflow_weather_etl_spark.operators.pq import (
        _opq_fixed_rotation,
        opq_adc_topk_fixed,
    )

    W = np.asarray(_opq_fixed_rotation(64))
    assert np.linalg.matrix_rank(W) == 64
    rows = opq_adc_topk_fixed(
        emb, query_id=33, m=8, n_codes=8, scale=1000, dim=64, k=10
    ).collect()
    scores = [int(r.adc_d2) for r in rows]
    assert len(set(scores)) == 10 and all(s > 0 for s in scores)


def test_new_fixed_twins_match_duckdb(spark, emb, duck):
    """opq_ann_topk_fixed / ivfpq_ann_topk_fixed replay bit-for-bit in
    DuckDB — the same check the correctness driver runs (round 16)."""
    from pyspark_airflow_weather_etl_spark.plans import REGISTRY

    for name in ["opq_ann_topk_fixed", "ivfpq_ann_topk_fixed"]:
        q = REGISTRY[name]
        got = q.fn(spark, SF_DIR).toPandas()
        got = got[sorted(got.columns)].sort_values(
            by=sorted(got.columns), ignore_index=True
        )
        want = duck.execute(q.oracle).fetchdf()
        want = want[sorted(want.columns)].sort_values(
            by=sorted(want.columns), ignore_index=True
        )
        assert got.astype("int64").equals(want.astype("int64")), name


def test_ivfpq_fixed_rerank_is_exact_within_candidates(spark, emb):
    """Stage 3 of ivfpq_topk_fixed must return EXACT integer distances
    for the rows it returns: every (id, qd2) pair recomputes to the
    same value from the raw quantized vectors."""
    from pyspark_airflow_weather_etl_spark.operators.pq import (
        ivfpq_topk_fixed,
    )

    got = {
        r.vec_id: int(r.qd2)
        for r in ivfpq_topk_fixed(emb, query_id=0, k=10).collect()
    }
    X = {
        r.vec_id: np.floor(np.asarray(r.embedding, dtype=np.float64) * 1000)
        .astype(np.int64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    for vid, qd2 in got.items():
        want = int(((X[vid] - X[0]) ** 2).sum())
        assert qd2 == want, vid


class TestIvfpqLifecycle:
    def test_single_batch_tree_equals_at_rest_probe(
        self, spark, emb, qvec, tmp_path
    ):
        """A one-batch lifecycle tree must serve the SAME rows as
        ivfpq_topk_at_rest driven by the tree's own frozen quantizers
        — the lifecycle adds append machinery, not new search
        semantics."""
        from pyspark_airflow_weather_etl_spark.operators.pq import (
            _read_codebooks,
            ivfpq_index_append,
            ivfpq_index_topk,
            ivfpq_topk_at_rest,
        )

        path = str(tmp_path / "ivfpq_one")
        ivfpq_index_append(emb, path, 0, m=8, n_codes=16, n_cells=16)
        cents = np.asarray(
            [
                list(r["c"])
                for r in spark.read.parquet(f"{path}/centroids")
                .orderBy("cell")
                .collect()
            ]
        )
        books = _read_codebooks(spark, path, 8, 16)
        want = sorted(
            map(
                tuple,
                ivfpq_topk_at_rest(
                    spark, f"{path}/rows/batch=0", qvec, cents, books,
                    k=10, nprobe=4, rerank=64,
                ).collect(),
            )
        )
        got = sorted(
            map(
                tuple,
                ivfpq_index_topk(
                    spark, path, qvec, k=10, nprobe=4, rerank=64
                ).collect(),
            )
        )
        assert got == want

    def test_lifecycle_append_probe_fold_and_guards(
        self, spark, emb, qvec, tmp_path
    ):
        """The full append contract: two mod-2 batches probe with the
        latest-wins fold active (interleaved ranges), a replayed batch
        is idempotent, a re-delivered changed vector serves its newest
        row, mismatched quantizer shapes raise, and a centroids-
        without-meta tree is refused."""
        import shutil

        from pyspark_airflow_weather_etl_spark.operators.pq import (
            ivfpq_index_append,
            ivfpq_index_topk,
        )

        path = str(tmp_path / "ivfpq_inc")
        r0 = ivfpq_index_append(
            emb.where(F.col("vec_id") % 2 == 0), path, 0,
            m=8, n_codes=16, n_cells=16,
        )
        ivfpq_index_append(
            emb.where(F.col("vec_id") % 2 == 1), path, 1,
            m=8, n_codes=16, n_cells=16,
        )
        assert r0["n_rows"] == emb.where(F.col("vec_id") % 2 == 0).count()
        probe = ivfpq_index_topk(spark, path, qvec, k=10, nprobe=4)
        plan = probe._jdf.queryExecution().analyzed().toString()
        assert "max_by" in plan  # interleaved ranges: fold armed
        want = sorted(map(tuple, probe.collect()))
        assert want[0][1] == 0.0 or any(d == 0.0 for _, d in want)
        # idempotent replay
        ivfpq_index_append(
            emb.where(F.col("vec_id") % 2 == 1), path, 1,
            m=8, n_codes=16, n_cells=16,
        )
        assert (
            sorted(
                map(
                    tuple,
                    ivfpq_index_topk(
                        spark, path, qvec, k=10, nprobe=4
                    ).collect(),
                )
            )
            == want
        )
        # re-delivered id 0 with the NEGATED vector: the probe must
        # serve the newest row — the self-hit at distance 0 disappears
        upd = emb.where(F.col("vec_id") == 0).select(
            "vec_id",
            F.transform("embedding", lambda v: -v).alias("embedding"),
        )
        ivfpq_index_append(upd, path, 2, m=8, n_codes=16, n_cells=16)
        got2 = {
            r.vec_id: r.l2_d2
            for r in ivfpq_index_topk(
                spark, path, qvec, k=500, nprobe=16, rerank=1000
            ).collect()
        }
        if 0 in got2:
            assert got2[0] > 0.0
        # frozen quantizer shape: mismatched appends raise
        with pytest.raises(ValueError, match="encode incompatibly"):
            ivfpq_index_append(emb, path, 3, m=4, n_codes=16, n_cells=16)
        # centroids without meta: foreign/partial artifact is refused
        shutil.rmtree(f"{path}/meta")
        with pytest.raises(ValueError, match="centroids but no meta"):
            ivfpq_index_append(emb, path, 3, m=8, n_codes=16, n_cells=16)

    def test_disjoint_batches_skip_fold(self, spark, emb, qvec, tmp_path):
        """Disjoint-range appends prove no re-delivery: the probe
        drops the fold (max_by absent); removing the manifest re-arms
        it with identical results."""
        import shutil

        from pyspark_airflow_weather_etl_spark.operators.pq import (
            ivfpq_index_append,
            ivfpq_index_topk,
        )

        n = emb.count() // 2
        path = str(tmp_path / "ivfpq_disjoint")
        ivfpq_index_append(
            emb.where(F.col("vec_id") < n), path, 0,
            m=8, n_codes=16, n_cells=16,
        )
        ivfpq_index_append(
            emb.where(F.col("vec_id") >= n), path, 1,
            m=8, n_codes=16, n_cells=16,
        )
        df = ivfpq_index_topk(spark, path, qvec, k=10, nprobe=4)
        assert "max_by" not in (
            df._jdf.queryExecution().analyzed().toString()
        )
        want = sorted(map(tuple, df.collect()))
        shutil.rmtree(f"{path}/rows_manifest")
        df2 = ivfpq_index_topk(spark, path, qvec, k=10, nprobe=4)
        assert "max_by" in df2._jdf.queryExecution().analyzed().toString()
        assert sorted(map(tuple, df2.collect())) == want

    def test_probe_prunes_partitions_and_columns(
        self, spark, emb, qvec, tmp_path
    ):
        """Scale contract: the ADC stage's scan is pruned to the
        probed ivf_cell= partitions AND reads only (id, pq_code) —
        never the vector column (codes are 8 B/row; vectors 256 B)."""
        import re

        from pyspark_airflow_weather_etl_spark.operators.pq import (
            ivfpq_index_append,
            ivfpq_index_topk,
        )

        path = str(tmp_path / "ivfpq_prune")
        ivfpq_index_append(emb, path, 0, m=8, n_codes=16, n_cells=16)
        plan = (
            ivfpq_index_topk(spark, path, qvec, k=10, nprobe=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "ivf_cell" in m.group(1), plan
        m2 = re.search(r"ReadSchema: ([^\n]*pq_code[^\n]*)", plan)
        assert m2 and "embedding" not in m2.group(1), plan

    def test_recall_floor(self, spark, emb, xmat, qvec, tmp_path):
        """Lifecycle probe recall vs exact L2 top-10 on the fixture
        (same floor as the at-rest entry)."""
        from pyspark_airflow_weather_etl_spark.operators.pq import (
            ivfpq_index_append,
            ivfpq_index_topk,
        )

        path = str(tmp_path / "ivfpq_recall")
        ivfpq_index_append(
            emb.where(F.col("vec_id") % 2 == 0), path, 0,
            m=8, n_codes=16, n_cells=16,
        )
        ivfpq_index_append(
            emb.where(F.col("vec_id") % 2 == 1), path, 1,
            m=8, n_codes=16, n_cells=16,
        )
        ids, X = xmat
        q = np.asarray(qvec)
        d2 = ((X - q[None, :]) ** 2).sum(axis=1)
        top10 = {int(ids[i]) for i in np.argsort(d2)[:10]}
        got = {
            r.vec_id
            for r in ivfpq_index_topk(
                spark, path, qvec, k=10, nprobe=4, rerank=64
            ).collect()
        }
        assert len(got & top10) / 10 >= 0.5


def test_streaming_ivfpq_index_maintenance_and_compact(spark, emb, qvec, tmp_path):
    """The streaming IVF-PQ maintainer (round 16): the first
    micro-batch trains and freezes BOTH quantizers in the tree, the
    streamed index's probe equals the incremental batch build's with
    the same mod-3 decomposition, and ivfpq_index_compact folds the
    delta tree into a probe-identical single-batch version whose
    manifest re-arms the disjoint fast path (fold absent from the
    post-compaction plan)."""
    import glob
    import os

    from pyspark_airflow_weather_etl_spark.operators.pq import (
        ivfpq_index_append,
        ivfpq_index_compact,
        ivfpq_index_topk,
    )
    from pyspark_airflow_weather_etl_spark.operators.retrieval import (
        bm25_index_current,
    )
    from pyspark_airflow_weather_etl_spark.streaming.ivfpq_index import (
        run_streaming_ivfpq_index,
    )

    src = emb.select("vec_id", "embedding")
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    for i in range(3):
        stage = str(tmp_path / f"stage_{i}")
        src.where(F.col("vec_id") % 3 == i).coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{watch}/batch_{i:03d}.parquet"
        os.rename(part, dst)
        os.utime(dst, (1_700_000_000 + i * 60,) * 2)
    idx = str(tmp_path / "index")
    reports = run_streaming_ivfpq_index(
        spark, watch, idx, src.schema,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert [r["batch"] for r in reports] == [0, 1, 2]
    assert sum(r["n_rows"] for r in reports) == src.count()
    # probe-equivalent to the incremental batch build
    batch_idx = str(tmp_path / "batch_index")
    for i in range(3):
        ivfpq_index_append(
            src.where(F.col("vec_id") % 3 == i), batch_idx, i
        )
    got = sorted(
        map(
            tuple,
            ivfpq_index_topk(spark, idx, qvec, k=10, nprobe=4).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            ivfpq_index_topk(
                spark, batch_idx, qvec, k=10, nprobe=4
            ).collect(),
        )
    )
    assert got == want
    # mod-3 ranges interleave: the delta-tree probe folds
    probe = ivfpq_index_topk(spark, idx, qvec, k=10, nprobe=4)
    assert "max_by" in probe._jdf.queryExecution().analyzed().toString()
    # compaction: probe-identical, fold disarmed, one batch at rest
    dst = str(tmp_path / "pub")
    ivfpq_index_compact(spark, idx, dst)
    live = bm25_index_current(spark, dst)
    compacted = ivfpq_index_topk(spark, live, qvec, k=10, nprobe=4)
    assert sorted(map(tuple, compacted.collect())) == got
    assert "max_by" not in (
        compacted._jdf.queryExecution().analyzed().toString()
    )
    rows = spark.read.parquet(f"{live}/rows")
    assert rows.count() == src.count()
    assert rows.select("vec_id").distinct().count() == src.count()


def test_ivfpq_compact_duplicate_in_batch_keeps_row_consistency(
    spark, emb, tmp_path
):
    """The srp_index_compact round-16 lesson applied to IVF-PQ: when
    one batch carries duplicate rows for the same id with different
    vectors, the compaction's struct fold must keep (pq_code, vec,
    ivf_cell) from the SAME winning row — pinned by re-encoding every
    stored vector against the tree's own frozen quantizers and
    asserting the stored code and cell match it."""
    import numpy as np

    from pyspark_airflow_weather_etl_spark.operators.pq import (
        _read_codebooks,
        ivfpq_index_append,
        ivfpq_index_compact,
    )
    from pyspark_airflow_weather_etl_spark.operators.retrieval import (
        bm25_index_current,
    )

    src = emb.select("vec_id", "embedding").where(F.col("vec_id") < 60)
    dup = src.where(F.col("vec_id") < 8).select(
        "vec_id", F.transform("embedding", lambda v: -v).alias("embedding")
    )
    path = str(tmp_path / "t")
    ivfpq_index_append(src.unionByName(dup), path, 0, m=8, n_codes=8,
                       n_cells=4)
    ivfpq_index_compact(spark, path, str(tmp_path / "pub"))
    live = bm25_index_current(spark, str(tmp_path / "pub"))
    cents = np.asarray(
        [
            list(r["c"])
            for r in spark.read.parquet(f"{live}/centroids")
            .orderBy("cell")
            .collect()
        ]
    )
    books = _read_codebooks(spark, live, 8, 8)
    b_sq = (books**2).sum(axis=2)
    for r in spark.read.parquet(f"{live}/rows").collect():
        x = np.asarray(r["embedding"], dtype=np.float64)
        want_cell = int(((cents - x[None, :]) ** 2).sum(axis=1).argmin())
        dsub = x.shape[0] // 8
        want_code = [
            int(
                (
                    -2.0 * (x[j * dsub : (j + 1) * dsub] @ books[j].T)
                    + b_sq[j]
                ).argmin()
            )
            for j in range(8)
        ]
        assert int(r["ivf_cell"]) == want_cell, r["vec_id"]
        assert [int(c) for c in r["pq_code"]] == want_code, r["vec_id"]


def test_pq_encode_err_matches_numpy(emb, xmat, books):
    """pq_encode(err_col=...): the per-row quantization residual must
    equal the numpy per-sub-vector min distance sum exactly — it is
    the drift signal the IVF-PQ lifecycle stores and monitors."""
    from pyspark_airflow_weather_etl_spark.operators.pq import pq_encode

    ids, X = xmat
    m, n_codes, dsub = books.shape
    want = {}
    for i, x in zip(ids, X):
        want[int(i)] = sum(
            float(
                ((x[j * dsub : (j + 1) * dsub][None, :] - books[j]) ** 2)
                .sum(axis=1)
                .min()
            )
            for j in range(m)
        )
    got = {
        r.vec_id: r.qerr
        for r in pq_encode(emb, books, err_col="qerr")
        .select("vec_id", "qerr")
        .collect()
    }
    assert set(got) == set(want)
    for vid, qe in got.items():
        assert abs(qe - want[vid]) <= 1e-6, vid


def test_ivfpq_drift_report_and_refit(spark, emb, tmp_path):
    """The frozen-quantizer maintenance loop: appends log their
    residual ratio, a 5x-scaled shifted batch trips the re-fit
    recommendation (live recount over the stored qerr column — a
    narrow scan, no re-encode), and ivfpq_index_refit retrains both
    quantizers over the folded vectors and resets the baseline."""
    from pyspark_airflow_weather_etl_spark.operators.pq import (
        ivfpq_drift_report,
        ivfpq_index_append,
        ivfpq_index_refit,
        ivfpq_index_topk,
    )
    from pyspark_airflow_weather_etl_spark.operators.retrieval import (
        bm25_index_current,
    )

    src = emb.select("vec_id", "embedding")
    path = str(tmp_path / "idx")
    r0 = ivfpq_index_append(src.where(F.col("vec_id") % 2 == 0), path, 0)
    assert r0["drift_ratio"] == pytest.approx(1.0)
    ivfpq_index_append(src.where(F.col("vec_id") % 2 == 1), path, 1)
    rep = ivfpq_drift_report(spark, path, live="full")
    assert not rep["refit_recommended"]  # same distribution
    assert len(rep["batches"]) == 2
    # off-mode (log-only) agrees with the full recount here: no batch
    # was ever re-delivered with different content
    off = ivfpq_drift_report(spark, path, live="off")
    assert off["live_mean_qerr"] == pytest.approx(
        rep["live_mean_qerr"], rel=1e-9
    )
    with pytest.raises(ValueError, match="live"):
        ivfpq_drift_report(spark, path, live="bogus")
    # a shifted batch (5x scale) drifts far outside the frozen grid
    shifted = src.where(F.col("vec_id") < 100).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform("embedding", lambda v: v * 5).alias("embedding"),
    )
    r2 = ivfpq_index_append(shifted, path, 2)
    assert r2["drift_ratio"] > 5.0
    rep2 = ivfpq_drift_report(spark, path, live="full")
    assert rep2["refit_recommended"]
    # refit: fresh quantizers over the folded corpus, baseline reset
    dst = str(tmp_path / "refit")
    ivfpq_index_refit(spark, path, dst)
    live = bm25_index_current(spark, dst)
    rep3 = ivfpq_drift_report(spark, live, live="full")
    assert rep3["drift_ratio"] == pytest.approx(1.0, rel=1e-6)
    assert not rep3["refit_recommended"]
    # the refit tree still serves (self-hit on an original vector)
    q = [
        float(x)
        for x in src.where(F.col("vec_id") == 4).first()["embedding"]
    ]
    rows = ivfpq_index_topk(spark, live, q, k=5, nprobe=16).collect()
    assert rows[0]["vec_id"] == 4 and rows[0]["l2_d2"] == 0.0


def test_opq_lifecycle_one_batch_equals_at_rest_and_flavor_guard(
    spark, emb, qvec, tmp_path
):
    """The OPQ edition of the lifecycle (round 16): a one-batch
    opq=True tree serves the SAME rows as ivfpq_topk_at_rest driven
    by the tree's own frozen rotation/codebooks/centroids, and a
    plain-PQ append onto an OPQ tree (or vice versa) raises — codes
    from the two spaces are incomparable under one LUT."""
    from pyspark_airflow_weather_etl_spark.operators.pq import (
        _read_codebooks,
        _read_rotation,
        ivfpq_index_append,
        ivfpq_index_topk,
        ivfpq_topk_at_rest,
    )

    src = emb.select("vec_id", "embedding")
    path = str(tmp_path / "opq_one")
    ivfpq_index_append(src, path, 0, m=8, n_codes=16, n_cells=16,
                       opq=True)
    R = _read_rotation(spark, path)
    books = _read_codebooks(spark, path, 8, 16)
    cents = np.asarray(
        [
            list(r["c"])
            for r in spark.read.parquet(f"{path}/centroids")
            .orderBy("cell")
            .collect()
        ]
    )
    want = sorted(
        map(
            tuple,
            ivfpq_topk_at_rest(
                spark, f"{path}/rows/batch=0", qvec, cents, books,
                k=10, nprobe=4, rerank=64, rotation=R,
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            ivfpq_index_topk(
                spark, path, qvec, k=10, nprobe=4, rerank=64
            ).collect(),
        )
    )
    assert got == want
    with pytest.raises(ValueError, match="opq"):
        ivfpq_index_append(src, path, 1, m=8, n_codes=16, n_cells=16,
                           opq=False)
    # and the rotation is genuinely in play: the stored codes differ
    # from a plain-PQ tree's codes built from the same corpus
    plain = str(tmp_path / "plain")
    ivfpq_index_append(src, plain, 0, m=8, n_codes=16, n_cells=16)
    c_opq = {
        r.vec_id: list(r.pq_code)
        for r in spark.read.parquet(f"{path}/rows").collect()
    }
    c_plain = {
        r.vec_id: list(r.pq_code)
        for r in spark.read.parquet(f"{plain}/rows").collect()
    }
    assert any(c_opq[k] != c_plain[k] for k in c_opq)
