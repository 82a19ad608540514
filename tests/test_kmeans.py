"""k-means: the portable integer Lloyd twin vs a numpy replay and the
DuckDB oracle; the distributed float trainer vs a numpy Lloyd replay;
empty-cell carry-over."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_airflow_weather_etl_spark.operators.kmeans import (
    kmeans_cluster_fixed,
    kmeans_train_distributed,
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


def _int_lloyd(ids, X, k, iters, scale):
    """Pure-Python replay of the exact integer loop."""
    Q = np.floor(X * scale).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    cents = [Q[order[list(ids[order]).index(c)]].copy() for c in range(k)]

    def assign(cents):
        d2 = np.stack(
            [((Q - c[None, :]) ** 2).sum(axis=1) for c in cents], axis=1
        )
        return d2.argmin(axis=1)  # argmin first-hit == lowest cell

    for _ in range(iters):
        a = assign(cents)
        for c in range(k):
            members = Q[a == c]
            if len(members):
                s = members.sum(axis=0, dtype=np.int64)
                cents[c] = np.floor(
                    s.astype(np.float64) / len(members)
                ).astype(np.int64)
    return {int(i): int(c) for i, c in zip(ids, assign(cents))}


def test_fixed_matches_numpy_replay(emb, xmat):
    ids, X = xmat
    want = _int_lloyd(ids, X, k=8, iters=3, scale=1000)
    got = {
        r.vec_id: r.cell
        for r in kmeans_cluster_fixed(emb, k=8, iters=3, scale=1000).collect()
    }
    assert got == want


def test_fixed_matches_duckdb_oracle(spark, duck):
    """The driver's check, kept in-suite so a refactor can't silently
    break the unrolled-oracle contract between rounds."""
    from pyspark_airflow_weather_etl_spark.plans import REGISTRY

    q = REGISTRY["kmeans_cluster_fixed_embeddings"]
    got = q.fn(spark, SF_DIR).toPandas()
    got = got[sorted(got.columns)].sort_values(
        by=sorted(got.columns), ignore_index=True
    )
    want = duck.execute(q.oracle).fetchdf()
    want = want[sorted(want.columns)].sort_values(
        by=sorted(want.columns), ignore_index=True
    )
    assert got.equals(want)


def test_empty_cell_keeps_centroid(spark):
    """Init rows 0 and 1 are identical, so cell 1 never wins a point
    (ties go to cell 0) and must carry its centroid through every
    update without crashing or collapsing the codebook."""
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),
        (2, [10.0, 10.0]),
        (3, [10.2, 10.2]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: r.cell
        for r in kmeans_cluster_fixed(df, k=2, iters=2, scale=1000).collect()
    }
    # iteration 1: every point ties or resolves to cell 0, cell 1 is
    # EMPTY and must keep [0,0]. Iteration 2: cell 0's centroid moved
    # to the global mean, so the carried-over [0,0] centroid wins the
    # origin pair back — the final split proves the carry-over
    # happened (a dropped cell would leave everything in cell 0).
    assert got[0] == 1 and got[1] == 1
    assert got[2] == 0 and got[3] == 0


def test_distributed_trainer_matches_numpy_lloyd(spark, emb, xmat):
    """Full-corpus float Lloyd == numpy replay (same init, same
    statistic) within float tolerance; final assignments identical."""
    ids, X = xmat
    k, iters = 8, 3
    order = np.argsort(ids, kind="stable")
    cents = X[order[:k]].copy()
    for _ in range(iters):
        stat = -2.0 * (X @ cents.T) + (cents**2).sum(axis=1)[None, :]
        a = stat.argmin(axis=1)
        for c in range(k):
            members = X[a == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    got = kmeans_train_distributed(emb, k=k, iters=iters)
    assert np.allclose(got, cents, atol=1e-9)


def test_distributed_trainer_recovers_planted_clusters(spark):
    """On clustered data the trainer must separate the clusters: every
    planted member lands in the same cell as its cluster's seed."""
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((4, 8)) * 5.0
    rows = []
    truth = {}
    # interleave ids across clusters so the k lowest-id init rows seed
    # one centroid per true cluster (lowest-id init is deterministic,
    # not informed — a caller clusters-sorted data at their peril)
    for j in range(20):
        for ci, c in enumerate(centers):
            vid = j * 4 + ci
            v = c + 0.05 * rng.standard_normal(8)
            rows.append((vid, [float(x) for x in v]))
            truth[vid] = ci
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_train_distributed(df, k=4, iters=5)
    from pyspark_airflow_weather_etl_spark.operators.similarity import (
        ivf_assign,
    )

    got = {
        r.vec_id: r.ivf_cell for r in ivf_assign(df, cents).collect()
    }
    # cluster purity: all members of a true cluster share one cell
    for ci in range(4):
        cells = {got[v] for v, t in truth.items() if t == ci}
        assert len(cells) == 1, f"cluster {ci} split across {cells}"


def test_diversity_sample_caps_and_spans_cells(emb):
    """Every cell contributes min(|cell|, per_cell) rows — dominant
    modes are capped, small clusters survive whole — and the sample is
    reproducible (same seed ⇒ same rows)."""
    from pyspark_airflow_weather_etl_spark.operators.kmeans import (
        diversity_sample_fixed,
        kmeans_cluster_fixed,
    )

    per_cell = 10
    cells = kmeans_cluster_fixed(emb, k=8, iters=3).groupBy("cell").count()
    sizes = {r.cell: r["count"] for r in cells.collect()}
    got = diversity_sample_fixed(emb, k=8, iters=3, per_cell=per_cell)
    rows = got.collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r.cell_rank)
    assert set(by_cell) == {c for c, n in sizes.items() if n > 0}
    for c, ranks in by_cell.items():
        assert len(ranks) == min(sizes[c], per_cell)
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    again = {
        (r.vec_id, r.cell, r.cell_rank)
        for r in diversity_sample_fixed(
            emb, k=8, iters=3, per_cell=per_cell
        ).collect()
    }
    assert again == {(r.vec_id, r.cell, r.cell_rank) for r in rows}
