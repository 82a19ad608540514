"""Near-dup self-consistency: MinHash-LSH against the exact Jaccard
ground truth on a corpus with injected near-duplicates (the fixture
corpus has none above threshold by construction at sf0.001).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    jaccard_pairs,
    minhash_near_duplicates,
    simhash,
)
from pyspark_airflow_weather_etl_spark.sources.tables import load_table

from conftest import SF_DIR


@pytest.fixture(scope="module")
def corpus(spark):
    """Fixture docs + exact copies + near copies (one token changed)."""
    docs = load_table(spark, SF_DIR, "documents").limit(100)
    exact_copies = docs.limit(10).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    near_copies = docs.limit(10).select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return docs.unionByName(exact_copies).unionByName(near_copies).cache()


def test_exact_dedup_finds_planted_copies(spark, corpus):
    dups = exact_duplicates(corpus, "doc_id", "text").where(F.col("n_copies") > 1)
    assert dups.count() == 10
    deduped = dedup_exact(corpus, "doc_id", "text")
    assert deduped.count() == 110  # 120 - 10 planted exact copies
    # canonical = min id → the original rows survive
    assert deduped.where(F.col("doc_id") >= 10_000).count() == 10  # near copies


def test_minhash_lsh_vs_exact_jaccard(spark, corpus):
    truth = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(corpus, "doc_id", "text", 0.5).collect()
    }
    found = {
        (r.id_a, r.id_b)
        for r in minhash_near_duplicates(corpus, "doc_id", "text", 0.5).collect()
    }
    assert truth, "planted near-dups must appear in the ground truth"
    # Precision is exact by construction (candidates are verified).
    assert found <= truth
    # Banding recall: 8 bands × 4 rows at j≥0.5 — planted pairs are
    # j≈0.9+, where the S-curve is ≈1.
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall}: {len(found)}/{len(truth)}"


def test_simhash_identical_and_near(spark, corpus):
    h = {r.doc_id: r.simhash for r in simhash(corpus, "doc_id", "text").collect()}
    orig_ids = sorted(k for k in h if k < 10_000)[:10]
    for base in orig_ids:
        assert h[base] == h[base + 10_000], "identical text → identical simhash"
        near = bin(h[base] ^ h[base + 20_000]).count("1")
        assert near <= 16, f"near-dup hamming {near} too far"


def test_jaccard_max_df_prunes_stop_shingles(spark):
    """A boilerplate phrase shared by every doc must not create pairs
    once its shingles exceed the document-frequency cap; docs that are
    near-dups beyond the boilerplate must survive pruning."""
    boiler = "terms of service apply to all content"
    rows = [
        # 1 & 2: true near-dups (same body, one token changed)
        (1, boiler + " alpha beta gamma delta epsilon zeta eta theta"),
        (2, boiler + " alpha beta gamma delta epsilon zeta eta iota"),
        # 3-8: unrelated bodies sharing ONLY the boilerplate
        (3, boiler + " red orange yellow green blue indigo violet one"),
        (4, boiler + " cat dog bird fish horse goat sheep two"),
        (5, boiler + " north south east west up down left three"),
        (6, boiler + " mon tue wed thu fri sat sun four"),
        (7, boiler + " jan feb mar apr may jun jul five"),
        (8, boiler + " zero uno dos tres cuatro cinco seis six"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(docs, "doc_id", "text", threshold=0.2).collect()
    }
    # boilerplate shingles tie every doc pair above 0.2
    assert len(uncapped) > 1

    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(
            docs, "doc_id", "text", threshold=0.2, max_df=4
        ).collect()
    }
    # only the true near-dup pair survives, and its similarity is now
    # measured over body shingles alone
    assert set(capped) == {(1, 2)}
    assert capped[(1, 2)] > uncapped[(1, 2)] - 0.3  # still high


def test_minhash_expr_impl_parity(spark, corpus):
    """The pure-JVM signature family (impl='expr') must deliver the
    same precision guarantee and comparable recall to the default
    Arrow family — different hash families, same collision stats."""
    truth = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(corpus, "doc_id", "text", 0.5).collect()
    }
    found = {
        (r.id_a, r.id_b)
        for r in minhash_near_duplicates(
            corpus, "doc_id", "text", 0.5, impl="expr"
        ).collect()
    }
    assert found <= truth
    assert len(found & truth) / len(truth) >= 0.9


def test_minhash_sig_chunking_invariant(spark):
    """Signatures must be identical whatever the lane-chunk budget:
    a tiny chunk (forcing both the multi-row grouping and the
    monster-document slice path) vs the default must agree bit-for-bit
    on long documents."""
    from pyspark_airflow_weather_etl_spark.operators.dedup import (
        _minhash_sig_udf,
        add_hashed_shingles,
    )

    long_text = " ".join(f"tok{i % 97}x{i % 13}" for i in range(3000))
    rows = [(1, long_text), (2, "short doc"), (3, ""), (4, long_text[:500])]
    df = add_hashed_shingles(
        spark.createDataFrame(rows, "doc_id long, text string"), "text"
    ).select("doc_id", "__shingles")

    def sigs(chunk):
        udf = _minhash_sig_udf(16, lane_chunk=chunk)
        return {
            r.doc_id: None if r.s is None else tuple(r.s)
            for r in df.select("doc_id", udf("__shingles").alias("s")).collect()
        }

    small, default = sigs(64), sigs(1 << 18)
    assert small == default
    assert small[1] is not None and len(small[1]) == 16
    assert small[3] is None  # empty text -> no shingles -> null signature


def test_incremental_minhash_equals_full_batch_restriction(spark, tmp_path):
    """The at-rest index must be interchangeable with recomputation:
    incremental(new batch vs indexed corpus) == the full-batch
    portable pipeline restricted to (corpus, new) pairs, orientation
    fixed to corpus-side first."""
    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.dedup import (
        portable_minhash_dedup_incremental,
        portable_minhash_index_write,
        portable_minhash_pairs,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table

    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "corpus_index")
    portable_minhash_index_write(old, path, "doc_id", "text")

    inc = {
        (r.corpus_id, r.new_id): round(r.jaccard, 9)
        for r in portable_minhash_dedup_incremental(
            new, path, "doc_id", "text", threshold=0.5
        ).collect()
    }
    full = portable_minhash_pairs(
        docs, "doc_id", "text", threshold=0.5
    ).collect()
    want = {}
    for r in full:
        a_even, b_even = r.id_a % 2 == 0, r.id_b % 2 == 0
        if a_even and not b_even:
            want[(r.id_a, r.id_b)] = round(r.jaccard, 9)
        elif b_even and not a_even:
            want[(r.id_b, r.id_a)] = round(r.jaccard, 9)
    assert inc == want
    assert inc, "fixture has cross near-dups; restriction must be nonempty"


def test_bucketed_incremental_matches_flat_and_skips_index_exchange(
    spark, tmp_path
):
    """The bucketed index variant must (a) produce exactly the flat
    variant's pairs and (b) plan the candidate join with the index
    side exchange-free — only the arriving batch shuffles. With
    broadcast and AQE disabled the exchange difference is visible
    directly: the flat form exchanges BOTH candidate-join sides, the
    bucketed form only the batch side."""
    import hashlib

    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.dedup import (
        portable_minhash_dedup_incremental,
        portable_minhash_dedup_incremental_bucketed,
        portable_minhash_index_write,
        portable_minhash_index_write_bucketed,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table

    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    flat_path = str(tmp_path / "flat_index")
    portable_minhash_index_write(old, flat_path, "doc_id", "text")
    table = "mh_test_" + hashlib.md5(str(tmp_path).encode()).hexdigest()[:8]
    spark.sql(f"DROP TABLE IF EXISTS {table}_bands")
    portable_minhash_index_write_bucketed(
        old, table, str(tmp_path / "bkt_index"), "doc_id", "text"
    )
    try:
        flat = portable_minhash_dedup_incremental(
            new, flat_path, "doc_id", "text", threshold=0.5
        )
        bkt = portable_minhash_dedup_incremental_bucketed(
            new, table, str(tmp_path / "bkt_index"), "doc_id", "text",
            threshold=0.5,
        )
        fa = sorted(
            (r.corpus_id, r.new_id, round(r.jaccard, 9))
            for r in flat.collect()
        )
        fb = sorted(
            (r.corpus_id, r.new_id, round(r.jaccard, 9))
            for r in bkt.collect()
        )
        assert fa == fb and fa

        confs = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "false",
        }
        olds = {k: spark.conf.get(k) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            flat_plan = (
                portable_minhash_dedup_incremental(
                    new, flat_path, "doc_id", "text", threshold=0.5
                )
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            bkt_plan = (
                portable_minhash_dedup_incremental_bucketed(
                    new, table, str(tmp_path / "bkt_index"), "doc_id",
                    "text", threshold=0.5,
                )
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            for k, v in olds.items():
                spark.conf.set(k, v)
        n_flat = flat_plan.count("Exchange hashpartitioning")
        n_bkt = bkt_plan.count("Exchange hashpartitioning")
        assert n_bkt == n_flat - 1, (
            f"bucketed index should drop exactly the index-side "
            f"candidate exchange: flat={n_flat} bucketed={n_bkt}"
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}_bands")


def test_cdc_chunk_locality_and_reference(spark):
    """The CDC property that justifies the operator: inserting one
    token reshapes only the chunk containing the edit — every other
    chunk keeps its digest — and boundaries match an independent
    Python replay of the md5 rule."""
    import hashlib

    from pyspark_airflow_weather_etl_spark.operators.dedup import (
        cdc_chunks,
    )

    a = "a b c d e f g h i j"
    b = "a b c d e X f g h i j"  # one insertion mid-stream

    def py_cdc(text):
        t = text.split(" ")
        bpos = [
            i
            for i in range(1, len(t))
            if hashlib.md5(t[i - 1].encode()).hexdigest()[-1] in ("0", "1")
        ]
        starts = [1] + [p + 1 for p in bpos]
        ends = bpos + [len(t)]
        return [
            hashlib.md5(
                " ".join(t[s - 1 : e]).encode()
            ).hexdigest()
            for s, e in zip(starts, ends)
        ]

    df = spark.createDataFrame(
        [(0, a), (1, b)], "doc_id bigint, text string"
    )
    got = {
        (r.doc_id, r.chunk_idx): r.digest
        for r in cdc_chunks(df).collect()
    }
    da, db = py_cdc(a), py_cdc(b)
    assert [got[(0, i)] for i in range(len(da))] == da
    assert [got[(1, i)] for i in range(len(db))] == db
    # locality: the two chunkings differ in exactly one digest
    assert len(set(da) - set(db)) == 1 and len(set(db) - set(da)) == 1


def test_containment_catches_inclusion_jaccard_misses(spark):
    """A short doc embedded verbatim in a 4x-longer one: containment
    1.0 (flagged) while Jaccard is far below its threshold (missed) —
    the asymmetric case the operator exists for."""
    from pyspark_airflow_weather_etl_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    short = " ".join(f"a{i}" for i in range(12))
    long = short + " " + " ".join(f"b{i}" for i in range(36))
    df = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id bigint, text string"
    )
    cont = containment_pairs(df, threshold=0.8).collect()
    assert [(r.id_a, r.id_b) for r in cont] == [(1, 2)]
    assert cont[0].containment == 1.0
    assert jaccard_pairs(df, "doc_id", "text", threshold=0.5).count() == 0
