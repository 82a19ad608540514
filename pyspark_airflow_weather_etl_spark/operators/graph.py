"""Iterative DataFrame algorithms: connected components for dedup
clustering.

Near-dup detection yields PAIRS; deduplication needs CLUSTERS (a≈b,
b≈c ⇒ {a,b,c} keep one). Components come from hash-min label
propagation: every node repeatedly adopts the smallest label in its
neighbourhood until a fixed point. Each round is two shuffles
(join + min-aggregate); rounds needed ≈ graph diameter, and near-dup
graphs are shallow (dup groups are cliques or short chains), so 3-6
rounds close real corpora.

Iterative DataFrame loops grow lineage without bound —
``localCheckpoint`` truncates the plan each round so round N+1 does
not re-run rounds 1..N (the classic iterative-algorithm footgun).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.iterate import round_checkpoint


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    algorithm: str = "star",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component id is the smallest node id reachable from it.

    ``algorithm='star'`` (default) is the alternating
    large-star/small-star edge contraction of Kiveris et al.,
    "Connected Components in MapReduce and Beyond" (SoCC'14): each
    round rewires edges toward per-neighborhood minima, so component
    diameter drops GEOMETRICALLY and convergence takes O(log)
    rounds regardless of graph shape — a pathological quoting chain
    in a 100 TB crawl converges just like a shallow dup clique,
    where per-round min-label propagation (``algorithm='label'``,
    the previous default, kept for A/B equality) needs
    diameter-many rounds and must abort past ``max_iter``. Both
    return identical labelings (equality pytest in
    tests/test_graph.py); both raise rather than return a
    silently-wrong clustering if ``max_iter`` is exhausted —
    ~impossible for star (20 rounds covers ~2^20 diameter).

    Measured trade (sf0.1 near-dup pair graph, warm): star 4.0 s vs
    label 2.4 s — star pays two rewire sub-steps plus a symmetric-
    difference convergence check per round, and SHALLOW graphs are
    label propagation's best case. The default buys worst-case
    robustness for a ~1.7× constant on the easy case; callers who
    KNOW their graph is shallow (e.g. verified dup cliques) can pass
    ``algorithm='label'``.

    ``checkpoint_dir``: round-state durability
    (:func:`..functions.iterate.round_checkpoint`). Default None =
    localCheckpoint — fastest, but blocks are executor-pinned, so an
    executor loss mid-loop fails the job. A reliable path (HDFS /
    object store) makes each round's state recoverable; results are
    identical either way (equality pytest)."""
    if algorithm == "star":
        return _star_contract(edges, src, dst, max_iter, checkpoint_dir)
    if algorithm == "label":
        return _propagate(edges, src, dst, max_iter, checkpoint_dir)
    raise ValueError(f"unknown algorithm {algorithm!r}")


def _canon(e: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (u, v) with u < v, distinct."""
    return (
        e.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .dropDuplicates()
    )


def _canon_on(e: DataFrame, par: int, key: str) -> DataFrame:
    """:func:`_canon` fused with the repartition that used to FOLLOW
    it (round 17, guide §2.4): hash-partitioning on ``key`` (a subset
    of the distinct keys (u, v)) satisfies the distinct's clustering
    requirement, so the dedup runs inside the same exchange instead
    of paying its own (u, v) exchange first — the duplicate-carrying
    rows shuffle ONCE, not once per step. Plan-pinned in
    tests/test_graph.py."""
    return (
        e.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .repartition(par, key)
        .dropDuplicates()
    )


def _is_star_forest_violation(e: DataFrame):
    """ONE-job convergence check for star contraction (round 17,
    guide §2.6 — it replaces TWO symmetric-difference ``exceptAll``
    jobs per round): a canonical (u < v, distinct) edge set is a
    min-rooted star forest — and therefore a FIXED POINT of the
    large-star/small-star round (both steps map a star forest to
    itself; see _star_contract) — iff no node appears as a child
    twice and no node is both a parent and a child. Returns a frame
    whose non-emptiness is the violation flag; consuming it with
    ``limit(1).count()`` is the per-round convergence job. Stopping
    at the FIRST star-forest round yields the same labeling as the
    old equality check one round later (applying a round to a star
    forest is the identity)."""
    m = e.select(
        F.col("u").alias("x"), F.lit(1).alias("cu"), F.lit(0).alias("cv")
    ).unionByName(
        e.select(
            F.col("v").alias("x"), F.lit(0).alias("cu"), F.lit(1).alias("cv")
        )
    )
    stats = m.groupBy("x").agg(
        F.sum("cu").alias("nu"), F.sum("cv").alias("nv")
    )
    return stats.where(
        (F.col("nv") > 1) | ((F.col("nu") > 0) & (F.col("nv") > 0))
    )


def _star_contract(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    par = edges.sparkSession.sparkContext.defaultParallelism
    raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    first = round_checkpoint(_canon_on(raw, par, "u"), checkpoint_dir)
    # original node universe — the final star forest omits roots'
    # self rows, and label joins must cover every input node. Built
    # from the RAW endpoints, not the canonical edge set: _canon
    # drops self-loops (u == v), and a node appearing ONLY in
    # self-loop edges is still a (singleton) component — label
    # propagation keeps it, so star must too (equality pytest covers
    # the self-loop case).
    nodes = round_checkpoint(
        raw.select(F.col("a").alias("node"))
        .unionByName(raw.select(F.col("b").alias("node")))
        .repartition(par, "node")
        .dropDuplicates(),
        checkpoint_dir,
    )
    e = first
    converged = False
    for _ in range(max_iter):
        # LARGE-STAR: per node n over ALL neighbors, connect every
        # strictly-larger neighbor to m = min(n, min neighbor).
        both = e.select(F.col("u").alias("n"), F.col("v").alias("w")).unionByName(
            e.select(F.col("v").alias("n"), F.col("u").alias("w"))
        ).repartition(par, "n")
        mins = both.groupBy("n").agg(F.min("w").alias("mn"))
        # canon fused with small-star's repartition: partitioned on v
        # (= small-star's n), deduped in place — one exchange, not two
        large = _canon_on(
            both.join(mins, "n")
            .where(F.col("w") > F.col("n"))
            .select(
                F.col("w").alias("a"),
                F.least("n", "mn").alias("b"),
            ),
            par,
            "v",
        )
        # SMALL-STAR: orient each edge from its larger endpoint; per
        # node n over its smaller neighbors, connect them (and n) to
        # the minimum. `large` is already hash-partitioned on v = n,
        # so the groupBy and join below add no exchange.
        oriented = large.select(F.col("v").alias("n"), F.col("u").alias("w"))
        smins = oriented.groupBy("n").agg(F.min("w").alias("mn"))
        small = _canon_on(
            oriented.join(smins, "n")
            .select(F.col("w").alias("a"), F.col("mn").alias("b"))
            .unionByName(
                smins.select(
                    F.col("n").alias("a"), F.col("mn").alias("b")
                )
            ),
            par,
            "u",
        )
        # Lazy checkpoint: the convergence job below is the round's
        # ONLY action — it materializes the round state and answers
        # "is this a star forest (= fixed point)?" in one pass. The
        # pre-r17 loop paid an eager-checkpoint job plus two
        # exceptAll jobs per round, and always ran one extra round
        # (set equality detects the fixed point a round after the
        # star forest first appears).
        small = round_checkpoint(small, checkpoint_dir, eager=False)
        changed = _is_star_forest_violation(small).limit(1).count()
        e = small
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components(star) did not converge in {max_iter} "
            "rounds — geometric contraction makes this ~impossible for "
            "any real graph; raise max_iter"
        )
    # fixed point is a min-rooted star forest: every non-root node
    # has exactly one edge (node=v, root=u); roots and nodes whose
    # component is a singleton-after-contraction label themselves
    stars = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    return nodes.join(stars, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


def _propagate(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    # Iterative-algorithm sizing: each round is two small shuffles of
    # label-sized state; at the session default (often 200) that is
    # hundreds of near-empty tasks per round. Instead of mutating the
    # session-global spark.sql.shuffle.partitions (which would leak
    # into concurrent queries on the same session), size the loop with
    # EXPLICIT hash repartitions on the join/agg keys: both join
    # inputs arrive hash-partitioned on their key at the same count,
    # which satisfies the join's distribution requirement, so no
    # conf-sized exchange is ever planned inside the loop. (Measured
    # 2× at fixture scale; on a large cluster size `par` to the label
    # volume instead.)
    par = edges.sparkSession.sparkContext.defaultParallelism
    # symmetric edge list (propagate both directions), materialized
    # ONCE: every structure below must derive from this checkpoint —
    # deriving from `edges` again would re-run the (possibly
    # expensive) upstream pipeline that produced the pairs, once per
    # consumer and once per propagation round. Partitioned on the
    # join key `v` before the checkpoint so every round's join reads
    # it pre-aligned (localCheckpoint preserves partitioning).
    sym = round_checkpoint(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .repartition(par, "u", "v")
        .dropDuplicates()
        .repartition(par, "v"),
        checkpoint_dir,
    )
    # sym is symmetric, so `u` alone covers every node
    labels = round_checkpoint(
        sym.select(F.col("u").alias("node"))
        .repartition(par, "node")
        .dropDuplicates()
        .select("node", F.col("node").alias("component")),
        checkpoint_dir,
    )

    converged = False
    for _ in range(max_iter):
        # label each node with the min of (its label, neighbours' labels)
        neighbour_min = (
            sym.join(labels, sym.v == labels.node)
            .select("u", "component")
            .repartition(par, "u")
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbour_min, labels.node == neighbour_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
            )
        )
        # Lazy checkpoint: the changed-count job below is the round's
        # only action — it materializes the new labels while counting
        # the diff (an eager checkpoint would be a second job per
        # round; round 17, guide §2.6 fewer jobs).
        new_labels = round_checkpoint(new_labels, checkpoint_dir, eager=False)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter); raise max_iter — labels "
            "at this point would be a wrong clustering, not an "
            "approximation"
        )
    return labels


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Near-dup pairs → (node, component, is_canonical): one canonical
    representative (min id) per transitive duplicate cluster — the row
    set to KEEP is everything outside ``pairs`` plus the canonical
    member of each cluster."""
    comp = connected_components(pairs, id_a, id_b)
    return comp.withColumn(
        "is_canonical", F.col("node") == F.col("component")
    )


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    quality_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """The dedup ACTION: ``df`` minus near-duplicates, keeping the
    HIGHEST-``quality_col`` member of each transitive duplicate
    cluster (ties break to the lowest id) — what a training pipeline
    actually ships, vs min-id canonicalization which can discard the
    best copy of a near-dup group. Rows outside every cluster pass
    through untouched.

    Cost: the component propagation over the (small) pair graph, one
    window over cluster members, and two semi/anti joins against the
    corpus — the corpus itself shuffles only for the final keyed
    semi-join."""
    from pyspark.sql import Window

    comp = connected_components(pairs, id_a, id_b)
    scored = comp.join(
        df.select(F.col(id_col).alias("node"), F.col(quality_col)), "node"
    )
    w = Window.partitionBy("component").orderBy(
        F.col(quality_col).desc(), F.col("node")
    )
    winners = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(F.col("node").alias(id_col))
    )
    outside = df.join(
        comp.select(F.col("node").alias(id_col)), id_col, "left_anti"
    ).select(id_col)
    return df.join(winners.unionByName(outside), id_col, "left_semi")
