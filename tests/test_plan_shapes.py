"""Physical-plan regression guards: the scale properties the engine
promises (broadcast dims, pushed filters, pruned scans, top-k heaps,
partial aggregation) must survive refactors. These inspect the
executed plan string the way `.explain("formatted")` renders it."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark_airflow_weather_etl_spark.plans import REGISTRY

from conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushes_filter_and_prunes_columns(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # 7 needed columns only — no l_orderkey/l_partkey/l_suppkey in the scan
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]
    assert plan.count("HashAggregate") >= 2, "partial+final aggregation"


def test_q3_broadcasts_dims_and_takeordered(spark):
    plan = _plan(spark, "q3_top_unshipped_orders")
    assert "TakeOrderedAndProject" in plan, "top-k must not global-sort"
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan, "dim filter pushed to scan"


def test_q5_all_dimension_joins_broadcast(spark):
    plan = _plan(spark, "q5_nation_revenue")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_semi_anti_join_operators(spark):
    assert "LeftSemi" in _plan(spark, "semi_join_big_spenders")
    assert "LeftAnti" in _plan(spark, "anti_join_no_pending")


def test_topk_is_heap_not_sort(spark):
    plan = _plan(spark, "topk_orders_by_price")
    assert "TakeOrderedAndProject" in plan


def test_window_topk_group_limit_pushdown(spark):
    plan = _plan(spark, "window_top_orders_per_customer")
    assert "WindowGroupLimit" in plan, (
        "rn<=k should push a per-group limit below the window sort"
    )


def test_range_join_stays_equi_keyed(spark):
    plan = _plan(spark, "range_join_views_before_purchase")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "name", ["minhash_near_dup_pairs", "ngram_jaccard_pairs"]
)
def test_near_dup_never_cross_joins(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_layout_joins_are_exchange_free(spark):
    """The co-bucketed orders/lineitem layout must remove every
    exchange from the fact-fact joins — even with broadcast disabled
    and shuffle partitions forced high (where a shuffle would be
    most visible). The plain-parquet forms of the same queries DO
    shuffle, which is the amortized-layout story bench measures."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "200",
        "spark.sql.adaptive.enabled": "false",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        for bucketed, plain in [
            ("q3_bucketed_layout", "q3_top_unshipped_orders"),
            ("q18_bucketed_layout", "q18_large_volume_customers"),
        ]:
            bp = _plan(spark, bucketed)
            pp = _plan(spark, plain)
            assert bp.count("Exchange hashpartitioning") == 0, (
                f"{bucketed} must not shuffle:\n{bp}"
            )
            assert pp.count("Exchange hashpartitioning") >= 2, (
                f"{plain} expected to shuffle its fact joins"
            )
            # same rows: bucketing is layout, not semantics
            got_b = sorted(map(tuple, REGISTRY[bucketed].fn(spark, SF_DIR).collect()))
            got_p = sorted(map(tuple, REGISTRY[plain].fn(spark, SF_DIR).collect()))
            assert got_b == got_p
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_q21_correlation_joins_and_topk(spark):
    """The EXISTS/NOT-EXISTS decorrelation must stay a semi + anti
    join pair (never a cartesian or a rewrite through aggregation),
    the order-status filter must push to the orders scan, and the
    top-100 must be a heap."""
    plan = _plan(spark, "q21_waiting_suppliers")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "EqualTo(o_orderstatus,F)" in plan, "status filter pushed"
    assert "TakeOrderedAndProject" in plan, "top-k must not global-sort"


def test_q13_outer_join_preserves_zero_customers(spark):
    """The priority exclusion is a JOIN-side predicate: pushing it
    below the left-outer join as a filter would drop the 0-order
    bucket. Guard the join type and that customers scan unfiltered."""
    plan = _plan(spark, "q13_customer_order_distribution")
    assert "LeftOuter" in plan
    # the priority predicate pushes to the ORDERS scan (sound: the
    # right side of a left-outer join may filter), never the customer
    # scan, whose pushed-filter list must stay empty
    cust_scans = [
        seg for seg in plan.split("FileScan parquet")[1:]
        if "customer.parquet" in seg.split("ReadSchema")[0]
    ]
    assert cust_scans
    for seg in cust_scans:
        assert "PushedFilters: []" in seg.split("ReadSchema")[0]
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in plan


@pytest.mark.parametrize(
    "name,ok_keys",
    [
        ("global_shuffle_documents", ("__pid",)),
        ("pack_sequences_documents", ("__pid",)),
        ("token_budget_select_documents", ("__pid",)),
        ("quality_prune_documents", ("__pid",)),
        ("build_vocab_documents", ("__pid", "token")),
        # the within-source round is a legitimate GROUPED window
        # (hash shuffle on source — linear); the global rank must
        # still be __pid-anchored
        ("interleave_sources_documents", ("__pid", "source")),
    ],
)
def test_global_rank_never_single_partitions_the_corpus(spark, name, ok_keys):
    """Distributed prefix-sum invariants: the global order comes from
    ONE range exchange, every further exchange is keyed by the
    physical partition id (the narrow re-cluster for the cumsum
    window, or the tiny totals aggregate) or a declared group column,
    and every window is anchored on one of those keys — a window spec
    with NONE of them would be a global single-partition sort of the
    corpus, the exact scale-killer this machinery exists to avoid."""
    plan = _plan(spark, name)
    assert "Exchange rangepartitioning" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert any(k in line for k in ok_keys), (
                f"{name}: data-keyed hash exchange: {line}"
            )
        if "windowspecdefinition" in line:
            assert any(k in line for k in ok_keys), (
                f"{name}: global window: {line}"
            )


def test_global_shuffle_rank_is_jvm_decoded(spark):
    """global_shuffle carries the FULL corpus rows (pass-through op),
    so its local rank must come from the monotonically_increasing_id
    decode — a per-partition window would re-shuffle the wide frame
    on hashpartitioning(__pid). No window in the row-level plan may
    reference the shuffle key."""
    plan = _plan(spark, "global_shuffle_documents")
    assert "shiftrightunsigned" in plan, "id-decode rank replaced"
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "shuffle_key" not in line, (
                f"row-level window reintroduced: {line}"
            )


def test_encode_vocab_join_is_broadcast_hash(spark):
    """The vocab join must be a broadcast HASH join (vocab is
    max_vocab-bounded) — a nested-loop or cartesian here would scan
    vocab per token."""
    plan = _plan(spark, "encode_documents_vocab")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fixed_cells_cross_join_is_broadcast_bounded(spark):
    """semantic_dedup_fixed_cells scores every vector against the
    n_centroids-row table: that cross join must be the BROADCAST
    nested-loop form (tiny build side ships once), never a
    CartesianProduct shuffle of the corpus."""
    plan = _plan(spark, "semantic_dedup_fixed_cells")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_cap_per_group_pushes_group_limit(spark):
    """The per-source cap's rank <= k must push a per-group limit
    below the window sort (partial + final WindowGroupLimit) — the
    property that keeps a skewed mega-source from fully sorting."""
    plan = _plan(spark, "cap_documents_per_source")
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_nprobe_dedup_vectors_never_ride_the_cell_join(spark):
    """semantic_dedup(nprobe>1): candidates generate through NARROW
    (id, cell) frames — the 64-double vector column must attach by id
    join AFTER the pair distinct, never ride the (near-all-pairs at
    nprobe=4/16) cell join — and scoring must be the Arrow pair-dot
    kernel, not a per-pair interpreted fold (the 23.8 s → 3.7 s r9
    fix; BASELINE.md round-9 second-wave note)."""
    import re

    plan = _plan(spark, "semantic_dedup_embeddings_nprobe")
    assert "ArrowEvalPython" in plan  # the pair-dot kernel runs
    # find the cell equi-join (any physical flavor — broadcast at
    # fixture scale, SMJ at corpus scale) and check the join block's
    # next lines (its key lists and child projections) carry no
    # vector column
    m = re.search(
        r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin) "
        r"\[ivf_cell[^\n]*\n((?:.*\n){1,10})",
        plan,
    )
    assert m is not None, "expected the cell equi-join in the plan"
    joined_block = m.group(0)
    assert "v_a" not in joined_block and "v_b" not in joined_block, (
        "vector columns must not ride the cell join"
    )


def test_dsir_weights_lambda_join_is_broadcast(spark):
    """DSIR scoring: the per-occurrence λ join must be a broadcast
    HASH join (λ is n_buckets-bounded); the only nested-loop joins
    allowed are the broadcast one-row totals scalars. The selection
    rank must ride the prefix-sum machinery (range exchange), with
    every hash exchange keyed by the bucket, the id, or __pid —
    an unkeyed corpus-wide window would be the single-partition
    scale-killer."""
    plan = _plan(spark, "dsir_select_documents")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Exchange rangepartitioning" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert any(
                k in line for k in ("__b", "doc_id", "__pid")
            ), f"unkeyed exchange: {line}"
        if "windowspecdefinition" in line:
            assert any(
                k in line for k in ("__b", "doc_id", "__pid")
            ), f"global window: {line}"


def test_decontaminate_fraction_joins_stay_hashed(spark):
    """Fractional decontamination: the benchmark digest join is a
    broadcast HASH join on the md5 fingerprint; nothing cartesian,
    and the per-doc aggregate is partial+final."""
    plan = _plan(spark, "decontaminate_fraction_documents")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_gopher_gate_is_shuffle_free(spark):
    """The Gopher gate is pure per-row codegen: its plan must contain
    NO exchange of any kind — a shuffle appearing here means someone
    rewrote a rule as an aggregate and the gate stopped running at
    scan speed."""
    plan = _plan(spark, "gopher_quality_filter")
    assert "Exchange" not in plan
    assert "*(" in plan, "whole-stage codegen markers missing"


def test_pseudonymize_rank_is_prefix_sum(spark):
    """Identity-vault surrogate assignment: the distinct-key rank
    must be the distributed prefix-sum (range exchange + __pid
    anchoring), never a single-partition window over the keys."""
    plan = _plan(spark, "pseudonymize_events")
    assert "Exchange rangepartitioning" in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "__pid" in line, f"global window: {line}"


def test_classifier_scoring_is_exchange_free_arrow_only(spark):
    """Classifier margin path (round 17): scoring is a pure map stage
    — presence-array fold against a LITERAL weight array — so the
    plan must carry ZERO exchanges and no join of any kind (the
    pre-r17 shape paid a distinct exchange, a per-doc margin groupBy
    and two joins); the sigmoid step stays Arrow-batched
    (ArrowEvalPython) with no row-at-a-time Python anywhere."""
    from pyspark_airflow_weather_etl_spark.operators import classifier as C

    df = spark.createDataFrame(
        [(i, "a b c d") for i in range(20)], "doc_id long, text string"
    )
    model = C.train_quality_classifier(df.withColumn(
        "y", (df.doc_id % 2).cast("int")
    ), "y", dim=8, iters=1)
    plan = (
        C.score_quality_classifier(df, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_classifier_gradient_single_udf_evaluation(spark):
    """Round-17 training-loop guard: each gradient iteration must
    evaluate the margin+sigmoid pipeline ONCE per document — exactly
    one ArrowEvalPython node in the gradient job's plan (the pre-r17
    three-branch union re-evaluated the scored subtree per branch),
    and the only exchange is the tiny per-bucket aggregation's."""
    from pyspark_airflow_weather_etl_spark.operators import classifier as C
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "a b c d e") for i in range(20)], "doc_id long, text string"
    )
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("cb long, cl long")
    def resid(m: pd.Series, n: pd.Series, y: pd.Series) -> pd.DataFrame:
        return pd.DataFrame({"cb": m.astype("int64"), "cl": n.astype("int64")})

    docfeat = df.select(
        "doc_id",
        F.lit(1).alias("__y"),
        F.lit(5).cast("long").alias("__n_tok"),
        C._presence_bucket_array("text", 8).alias("__b"),
    )
    scored = docfeat.select(
        "__b",
        resid(
            C._margin_micro(F.col("__b"), [0.1] * 8), "__n_tok", "__y"
        ).alias("__r"),
    )
    contrib = F.concat(
        F.transform(
            "__b",
            lambda b: F.struct(b.alias("bucket"), F.col("__r.cb").alias("c")),
        ),
        F.array(
            F.struct(F.lit(-1).alias("bucket"), F.col("__r.cb").alias("c")),
            F.struct(F.lit(-2).alias("bucket"), F.col("__r.cl").alias("c")),
        ),
    )
    plan = (
        scored.select(F.explode(contrib).alias("__g"))
        .groupBy(F.col("__g.bucket").alias("bucket"))
        .agg(F.sum(F.col("__g.c").cast("decimal(38,0)")).alias("g"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
    assert plan.count("ArrowEvalPython") == 1, plan


def test_perplexity_buckets_rank_is_prefix_sum(spark):
    """CCNet bucketing: the global perplexity rank must be the
    distributed prefix-sum (range exchange + JVM id decode) — any
    windowspecdefinition in the plan may only ride the tiny
    per-partition offsets axis (__pid), never the corpus."""
    plan = _plan(spark, "perplexity_buckets_documents")
    assert "Exchange rangepartitioning" in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "__pid" in line, f"global window: {line}"


def test_bm25_adhoc_plan_shape(spark):
    """Plan-regression guard for the ad-hoc BM25 scorer: the term
    prune must reach the scan as an In/isin FILTER (no join to prune),
    small sides must broadcast (no SortMergeJoin anywhere — every join
    side is either tiny or already co-keyed), and the exchange count
    must not creep past the audited 6 (tf agg, df agg on the tiny
    persisted frame, the documented dl join pair, score agg, rank)."""
    from pyspark_airflow_weather_etl_spark.operators.retrieval import (
        bm25_topk,
    )
    from pyspark_airflow_weather_etl_spark.plans.retrievalplans import (
        BM25_QUERIES,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        bm25_topk(docs, BM25_QUERIES, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 6, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_pca_project_fixed_projection_no_exchange(spark):
    """The portable PCA projection is a pure map stage: after the
    one (n, S) aggregation round-trips as literals, the per-row
    rotate/center/emit must add ZERO exchanges — scan → project →
    generate, nothing corpus-sized ever shuffles."""
    from pyspark_airflow_weather_etl_spark.operators.pca import (
        pca_project_fixed,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    proj = pca_project_fixed(emb, k=8, scale=1000)
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bm25_adhoc_carries_dl_no_corpus_join(spark):
    """Round-16 reshape guard: the ad-hoc BM25 tf aggregation carries
    the document length through its groupBy (doc_id determines dl, so
    the groups are unchanged) — the pre-r16 corpus-sized (doc_id, dl)
    join must NOT reappear. The aggregate keyed (doc_id, dl, token)
    is the carrier; a refactor that drops dl from the keys brings the
    corpus join (and its exchange) back."""
    plan = _plan(spark, "bm25_topk_documents")
    agg_keys = [
        seg.split("]")[0]
        for seg in plan.split("HashAggregate(keys=[")[1:]
    ]
    assert any(
        "doc_id" in k and "dl" in k and "token" in k for k in agg_keys
    ), plan


def test_phrase_counts_candidate_map_below_join(spark):
    """Round-16 reshape guard: phrase matching slice-compares only at
    first-token candidate positions from a per-doc map computed BELOW
    the broadcast join (the pushed n_matches>0 filter duplicates the
    join-condition expression, so the duplicated part must stay the
    cheap candidate tail, not the full per-position scan)."""
    plan = _plan(spark, "phrase_match_documents")
    assert "map_from_arrays" in plan, plan
    assert "element_at(__fpos" in plan, plan


def test_proximity_counts_position_map_below_join(spark):
    """NEAR queries (round 17): one term→positions map per doc, then
    a literal (pair_id, n_pairs) struct array EXPLODES per document —
    no join at all, and the n_pairs filter sits above the Generate
    where it cannot be pushed into a duplicated evaluation (the
    r16 crossJoin shape re-ran the counting aggregate in the pushed
    join condition, once per doc×pair row)."""
    plan = _plan(spark, "proximity_match_documents")
    assert "map_from_arrays" in plan, plan
    assert "element_at(__tpos" in plan, plan
    assert "Join" not in plan, plan
    assert "Generate explode" in plan, plan
