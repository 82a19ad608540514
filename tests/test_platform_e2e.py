"""End-to-end platform flow: raw corpus → curated release → BM25
serving index → search → evaluation report. Each stage is separately
oracle-checked elsewhere; this test pins that the HANDOFFS compose —
the curated shards are what gets indexed, the index answers queries,
and the metrics close the loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR


def test_curate_index_search_evaluate(spark, tmp_path):
    from pyspark_airflow_weather_etl_spark.operators.curation import (
        curate_corpus,
    )
    from pyspark_airflow_weather_etl_spark.operators.retrieval import (
        bm25_index_write,
        bm25_topk,
        bm25_topk_at_rest,
        ranking_metrics,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)

    # 1. curate: dedup + phrase decontamination + shuffle + shards
    release = str(tmp_path / "release")
    counts = curate_corpus(
        docs,
        release,
        benchmark_phrases=["hash join table"],
        shard_rows=64,
    )
    assert counts["sharded"] > 0
    shards = spark.read.parquet(release)

    # 2. index the RELEASE (not the raw corpus)
    idx = str(tmp_path / "index")
    bm25_index_write(shards.select("doc_id", "text"), idx)

    # 3. search: the index must answer exactly like ad-hoc BM25 over
    # the same release
    queries = [(1, "slow merge batch"), (2, "dup scan")]
    served = sorted(
        map(tuple, bm25_topk_at_rest(spark, idx, queries, k=5).collect())
    )
    adhoc = sorted(
        map(
            tuple,
            bm25_topk(
                shards.select("doc_id", "text"), queries, k=5
            ).collect(),
        )
    )
    assert served == adhoc and len(served) > 0

    # 4. decontamination reached the index: no indexed doc contains
    # the benchmark phrase
    hits = bm25_topk_at_rest(spark, idx, [(9, "hash join table")], k=50)
    joined = hits.join(shards, "doc_id").where(
        F.col("text").contains("hash join table")
    )
    assert joined.count() == 0

    # 5. evaluate the served ranking against rule qrels — the report
    # is well-formed and bounded
    qrels = (
        shards.select("doc_id")
        .crossJoin(
            F.broadcast(
                spark.createDataFrame(queries, "query_id bigint, q string")
                .select("query_id")
            )
        )
        .where(F.col("doc_id") % 7 == F.col("query_id"))
    )
    report = ranking_metrics(
        bm25_topk_at_rest(spark, idx, queries, k=10), qrels, k=10
    ).collect()
    assert {r.query_id for r in report} == {1, 2}
    for r in report:
        assert 0.0 <= r.ndcg <= 1.0 and 0.0 <= r.mrr <= 1.0
        assert 0.0 <= r.recall <= 1.0 and r.n_hits <= r.n_relevant
