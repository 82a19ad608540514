"""Connected components / dedup clusters: known topologies, and the
end-to-end near-dup → cluster pipeline on planted duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.operators.dedup import jaccard_pairs
from pyspark_airflow_weather_etl_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)
from pyspark_airflow_weather_etl_spark.sources.tables import load_table

from conftest import SF_DIR


def test_components_chain_and_clique(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple rounds), clique
    # {10,11,12}, isolated edge 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {
        r.node: r.component for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_components_raise_when_unconverged(spark):
    """A chain whose diameter exceeds max_iter must raise, never return
    a silently-wrong clustering (ADVICE round 1) — the label-propagation
    variant's contract (star contracts geometrically and won't hit it)."""
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2, algorithm="label")
    # and with enough rounds the same chain is one component
    got = {
        r.component
        for r in connected_components(chain, algorithm="label").collect()
    }
    assert got == {0}


def test_star_converges_past_label_propagation_diameter_bound(spark):
    """The diameter-robust default: a 64-edge chain provably ABORTS
    label propagation at the default max_iter=20 (diameter 64 > 20
    rounds) but the large-star/small-star default converges to one
    component well inside the same budget — the 100 TB pathological-
    chain case (a crawl of quoting documents) that motivated the
    rewrite."""
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=20, algorithm="label")
    got = {
        r.node: r.component for r in connected_components(chain).collect()
    }
    assert got == {i: 0 for i in range(65)}


def test_star_equals_label_propagation(spark):
    """Equality A/B on a mixed-shape graph (chains, cliques, stars,
    isolated edges, duplicate and reversed edges, and SELF-LOOPS —
    a node appearing only in (u, u) edges is a singleton component
    both algorithms must return; ADVICE round 12): the two algorithms
    return the same labeling row-for-row."""
    import random

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(10, 20)]          # chain
    edges += [(a, b) for a in range(30, 34) for b in range(a + 1, 34)]
    edges += [(50, x) for x in range(51, 56)]            # star
    edges += [(70, 71), (72, 73), (71, 70)]              # dups/reversed
    edges += [(rng.randrange(100, 140), rng.randrange(100, 140))
              for _ in range(40)]                        # random blob
    edges += [(200, 200), (11, 11)]  # self-loop-only + in-component
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    star = {
        r.node: r.component
        for r in connected_components(df, algorithm="star").collect()
    }
    label = {
        r.node: r.component
        for r in connected_components(df, max_iter=50,
                                      algorithm="label").collect()
    }
    assert star == label


def test_dedup_clusters_end_to_end(spark):
    """Plant a transitive near-dup chain doc→copyA→copyB; the cluster
    must collapse to one canonical id."""
    docs = load_table(spark, SF_DIR, "documents").limit(30)
    a = docs.limit(5).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat("text", F.lit(" zzz")).alias("text"),
    )
    b = docs.limit(5).select(
        (F.col("doc_id") + 2000).alias("doc_id"),
        F.concat("text", F.lit(" zzz qqq")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(a).unionByName(b)
    pairs = jaccard_pairs(corpus, "doc_id", "text", threshold=0.5)
    clusters = dedup_clusters(pairs).collect()
    by_comp: dict[int, set[int]] = {}
    for r in clusters:
        by_comp.setdefault(r.component, set()).add(r.node)
    # each planted chain {d, d+1000, d+2000} lands in ONE component
    for d in [r.doc_id for r in docs.limit(5).collect()]:
        comps = [c for c, members in by_comp.items()
                 if {d, d + 1000, d + 2000} <= members]
        assert comps, f"chain for doc {d} not clustered: {by_comp}"
    canon = {r.node for r in clusters if r.is_canonical}
    assert all(r.component in canon for r in clusters)


def test_dedup_keep_best_prefers_quality_over_min_id(spark):
    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.graph import (
        dedup_keep_best,
    )

    docs = spark.createDataFrame(
        [
            (1, 10),  # cluster A: doc 2 has higher quality than doc 1
            (2, 99),
            (3, 50),  # cluster B: tie -> lowest id (3) wins
            (4, 50),
            (5, 7),  # no pairs: passes through
        ],
        "doc_id long, quality long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id
        for r in dedup_keep_best(docs, pairs, "doc_id", "quality").collect()
    )
    assert kept == [2, 3, 5]


def test_canon_fused_dedup_single_exchange(spark):
    """Round-17 fusion guard: _canon_on's distinct must REUSE the
    repartition's hash(key) exchange (key is a subset of the distinct
    keys (u, v)) — exactly one exchange in the plan. A refactor that
    reorders the dedup before the repartition brings the second
    (u, v) exchange back."""
    from pyspark_airflow_weather_etl_spark.operators.graph import _canon_on

    e = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 4), (4, 3), (5, 5)], "a long, b long"
    )
    out = _canon_on(e, 4, "u")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    got = sorted((r.u, r.v) for r in out.collect())
    assert got == [(1, 2), (3, 4)]


def test_star_forest_violation_is_fixed_point_check(spark):
    """The one-job convergence check: a min-rooted star forest has no
    violations; a chain (non-star) and a duplicate-child edge set
    do."""
    from pyspark_airflow_weather_etl_spark.operators.graph import (
        _is_star_forest_violation,
    )

    star = spark.createDataFrame(
        [(1, 2), (1, 3), (5, 6)], "u long, v long"
    )
    assert _is_star_forest_violation(star).count() == 0
    chain = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    assert _is_star_forest_violation(chain).count() > 0
