"""Corpus governance: takedown by content fingerprint, eval-set
decontamination by token n-gram overlap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.operators.governance import (
    apply_takedown,
    decontaminate,
)
from pyspark_airflow_weather_etl_spark.sources.tables import load_table

from conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_takedown_removes_content_duplicates_too(spark):
    """A byte-identical copy of a taken-down text under ANOTHER id
    must be removed as well — takedown keys on content, not ids."""
    docs = _docs(
        spark,
        [
            (0, "remove me please"),
            (1, "keep me around"),
            (2, "remove me please"),  # copy of doc 0, different id
            (3, "also kept"),
        ],
    )
    blocklist = spark.createDataFrame([(0,)], "doc_id long")
    kept = sorted(r.doc_id for r in apply_takedown(docs, blocklist).collect())
    assert kept == [1, 3]  # 0 (listed) and 2 (same content) both gone


def test_takedown_unlisted_corpus_untouched(spark):
    docs = _docs(spark, [(0, "a"), (1, "b")])
    blocklist = spark.createDataFrame([(99,)], "doc_id long")
    assert apply_takedown(docs, blocklist).count() == 2


def test_decontaminate_matches_token_boundaries_only(spark):
    """'quick brown fox' as a token trigram must NOT match a document
    where the words appear non-adjacently or inside other tokens."""
    docs = _docs(
        spark,
        [
            (0, "the quick brown fox jumps"),  # contaminated
            (1, "quick brown foxes are here"),  # 'foxes' != 'fox'
            (2, "quick and brown fox"),  # not adjacent
            (3, "quick brown fox"),  # exact
        ],
    )
    kept = sorted(
        r.doc_id
        for r in decontaminate(docs, ["quick brown fox"], n=3).collect()
    )
    assert kept == [1, 2]


def test_decontaminate_rejects_wrong_arity_phrase(spark):
    docs = _docs(spark, [(0, "a b c")])
    with pytest.raises(ValueError):
        decontaminate(docs, ["two tokens"], n=3)


def test_stratified_sample_deterministic_and_proportional(spark):
    from pyspark_airflow_weather_etl_spark.operators.governance import (
        stratified_sample,
    )

    docs = spark.range(8000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 2)).alias("source"),
    )
    frac = {"s0": 0.25, "s1": 1.0}
    a = stratified_sample(docs, "source", frac, "doc_id")
    counts = {r.source: r.n for r in a.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["s1"] == 4000  # frac 1.0 keeps everything
    assert 800 <= counts["s0"] <= 1200  # ~25% of 4000
    # pure function of the data: same rows under a different partitioning
    b = stratified_sample(docs.repartition(13), "source", frac, "doc_id")
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )
    # unlisted stratum is dropped
    c = stratified_sample(docs, "source", {"s0": 0.25}, "doc_id")
    assert c.where(F.col("source") == "s1").count() == 0


class TestTemperatureMix:
    """temperature_mix: alpha<1 must upweight small sources, hit the
    overall quota within md5-quantization tolerance, and stay a pure
    function of the data (partitioning-invariant)."""

    def test_upweights_small_sources_and_hits_quota(self, spark):
        from pyspark_airflow_weather_etl_spark.operators.governance import (
            temperature_mix,
        )

        docs = load_table(spark, SF_DIR, "documents")
        total = docs.count()
        base = {
            r["source"]: r["n"]
            for r in docs.groupBy("source").agg(
                F.count("*").alias("n")
            ).collect()
        }
        mixed = temperature_mix(
            docs, "source", "doc_id", alpha=0.5, target_fraction=0.25
        )
        kept = {
            r["source"]: r["n"]
            for r in mixed.groupBy("source").agg(
                F.count("*").alias("n")
            ).collect()
        }
        # overall quota: within quantization + md5-uniformity slack
        total_kept = sum(kept.values())
        assert abs(total_kept - 0.25 * total) / total < 0.05
        # alpha=0.5 upweights: the smallest source keeps a strictly
        # higher fraction than the largest
        smallest = min(base, key=base.get)
        largest = max(base, key=base.get)
        if base[smallest] < base[largest]:  # fixture has size spread
            f_small = kept.get(smallest, 0) / base[smallest]
            f_large = kept.get(largest, 0) / base[largest]
            assert f_small > f_large

    def test_partitioning_invariant(self, spark):
        from pyspark_airflow_weather_etl_spark.operators.governance import (
            temperature_mix,
        )

        docs = load_table(spark, SF_DIR, "documents")
        ids = lambda d: sorted(
            r.doc_id
            for r in temperature_mix(d, "source", "doc_id").select(
                "doc_id"
            ).collect()
        )
        assert ids(docs.repartition(3)) == ids(docs.repartition(17))


class TestDecontaminateAgainst:
    """Fractional n-gram decontamination vs a benchmark corpus
    (governance.decontaminate_against): verbatim/near-copies of
    benchmark docs die, incidental single-phrase overlap survives,
    short docs pass, and the integer threshold boundary is exact."""

    def _dfs(self, spark):
        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps over the lazy dog today")],
            "doc_id long, text string",
        )
        pool = spark.createDataFrame(
            [
                # verbatim benchmark copy: 100% overlap -> dropped
                (0, "the quick brown fox jumps over the lazy dog today"),
                # one shared 5-gram out of many: kept at 3/10
                (1, "the quick brown fox jumps high above every plain "
                    "ridge valley summit creek meadow forest tundra"),
                # disjoint text: kept, zero contaminated
                (2, "completely different words about trains planes "
                    "boats and automobiles rolling onward"),
                # shorter than n tokens: zero n-grams -> kept
                (3, "tiny doc here"),
            ],
            "doc_id long, text string",
        )
        return pool, bench

    def test_drop_keep_and_short(self, spark):
        from pyspark_airflow_weather_etl_spark.operators.governance import (
            decontaminate_against,
        )

        pool, bench = self._dfs(spark)
        kept = {
            r.doc_id: r
            for r in decontaminate_against(
                pool, bench, n=5, max_frac_numer=3, max_frac_denom=10
            ).collect()
        }
        assert set(kept) == {1, 2, 3}
        assert kept[1].n_contaminated >= 1
        assert kept[2].n_contaminated == 0
        assert kept[3].n_ngrams == 0 and kept[3].n_contaminated == 0

    def test_threshold_boundary_is_inclusive(self, spark):
        """n_contaminated·denom == numer·n_ngrams keeps the doc (the
        rule is 'MORE than the fraction drops') — exact integers, no
        float boundary."""
        from pyspark_airflow_weather_etl_spark.operators.governance import (
            decontaminate_against,
        )

        bench = spark.createDataFrame(
            [(100, "a b c d e")], "doc_id long, text string"
        )
        # doc with exactly 2 distinct 5-grams, 1 contaminated
        pool = spark.createDataFrame(
            [(0, "a b c d e f")], "doc_id long, text string"
        )
        at = decontaminate_against(
            pool, bench, n=5, max_frac_numer=1, max_frac_denom=2
        ).collect()
        assert [r.doc_id for r in at] == [0]  # 1/2 == 1/2 -> kept
        below = decontaminate_against(
            pool, bench, n=5, max_frac_numer=1, max_frac_denom=3
        ).collect()
        assert below == []  # 1/2 > 1/3 -> dropped

    def test_distinct_grams_not_occurrences(self, spark):
        """A doc repeating one contaminated phrase many times is
        judged on DISTINCT grams — repetition cannot push a doc over
        (or under) the threshold."""
        from pyspark_airflow_weather_etl_spark.operators.governance import (
            decontaminate_against,
        )

        bench = spark.createDataFrame(
            [(100, "p q r s t")], "doc_id long, text string"
        )
        pool = spark.createDataFrame(
            [(0, "p q r s t " * 8 + "u v w x y z aa bb cc dd ee ff "
                 "gg hh ii jj kk ll mm nn oo pp qq rr")],
            "doc_id long, text string",
        )
        row = decontaminate_against(
            pool, bench, n=5, max_frac_numer=5, max_frac_denom=10
        ).collect()
        # distinct-gram accounting keeps n_contaminated bounded by the
        # distinct contaminated phrases, not the 8 repetitions
        assert row and row[0].n_contaminated < 8


class TestIdentityVault:
    """Pseudonymization vault (governance.build_identity_vault /
    vault_extend / pseudonymize): dense deterministic surrogates,
    the never-remap stability contract, versioned persistence."""

    def test_dense_and_partitioning_invariant(self, spark):
        from pyspark_airflow_weather_etl_spark.operators.governance import (
            build_identity_vault,
        )

        ev = load_table(spark, SF_DIR, "events")
        m = {
            r.user_id: r.surrogate_id
            for r in build_identity_vault(ev, "user_id").collect()
        }
        n = len(m)
        assert sorted(m.values()) == list(range(1, n + 1))
        # key order -> surrogate order
        assert [m[k] for k in sorted(m)] == list(range(1, n + 1))
        m2 = {
            r.user_id: r.surrogate_id
            for r in build_identity_vault(
                ev.repartition(13), "user_id"
            ).collect()
        }
        assert m2 == m

    def test_extend_never_remaps(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from pyspark_airflow_weather_etl_spark.operators.governance import (
            vault_extend,
            vault_read,
        )

        path = str(tmp_path / "vault")
        first = spark.createDataFrame(
            [(10,), (30,), (20,)], "user_id long"
        )
        v1 = {
            r.user_id: r.surrogate_id
            for r in vault_extend(spark, path, first, "user_id").collect()
        }
        assert v1 == {10: 1, 20: 2, 30: 3}
        # second batch: one known key, two new — known keeps its id,
        # new ones continue past the max
        second = spark.createDataFrame(
            [(20,), (5,), (40,)], "user_id long"
        )
        v2 = {
            r.user_id: r.surrogate_id
            for r in vault_extend(spark, path, second, "user_id").collect()
        }
        assert v2[10] == 1 and v2[20] == 2 and v2[30] == 3
        assert sorted(v2.values()) == [1, 2, 3, 4, 5]
        assert v2[5] == 4 and v2[40] == 5  # key order among the new
        # persisted: a fresh read sees the same mapping
        v3 = {
            r.user_id: r.surrogate_id
            for r in vault_read(spark, path).collect()
        }
        assert v3 == v2

    def test_pseudonymize_drops_unmapped(self, spark):
        from pyspark_airflow_weather_etl_spark.operators.governance import (
            build_identity_vault,
            pseudonymize,
        )

        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "user_id long, x string"
        )
        vault = build_identity_vault(df.where("user_id < 3"), "user_id")
        out = pseudonymize(df, vault, "user_id").collect()
        assert sorted((r.surrogate_id, r.x) for r in out) == [
            (1, "a"),
            (2, "b"),
        ]
        assert "user_id" not in pseudonymize(df, vault, "user_id").columns


class TestSplitCorpus:
    def test_stable_under_growth_and_repartition(self, spark):
        """A document's split never changes when the corpus grows or
        the partitioning changes — the held-out-stays-held-out
        contract."""
        from pyspark_airflow_weather_etl_spark.operators.governance import (
            split_corpus,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        small = split_corpus(docs.where(F.col("doc_id") < 100))
        grown = split_corpus(docs.repartition(13))
        j = small.select("doc_id", F.col("split").alias("a")).join(
            grown.select("doc_id", F.col("split").alias("b")), "doc_id"
        )
        assert j.where(F.col("a") != F.col("b")).count() == 0

    def test_proportions_roughly_hold(self, spark):
        from pyspark_airflow_weather_etl_spark.operators.governance import (
            split_corpus,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        counts = {
            r["split"]: r["n"]
            for r in split_corpus(docs)
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        total = sum(counts.values())
        assert counts.get("train", 0) / total > 0.9
        assert 0 < counts.get("validation", 0) < 0.1 * total
        assert 0 < counts.get("test", 0) < 0.1 * total

    def test_salt_changes_assignment(self, spark):
        from pyspark_airflow_weather_etl_spark.operators.governance import (
            split_corpus,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        a = split_corpus(docs, salt="v1").select(
            "doc_id", F.col("split").alias("a")
        )
        b = split_corpus(docs, salt="v2").select(
            "doc_id", F.col("split").alias("b")
        )
        moved = a.join(b, "doc_id").where(F.col("a") != F.col("b")).count()
        assert moved > 0

    def test_bad_percents_raise(self, spark):
        import pytest as _pytest

        from pyspark_airflow_weather_etl_spark.operators.governance import (
            split_corpus,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        with _pytest.raises(ValueError):
            split_corpus(docs, splits=[("a", 50), ("b", 49)])

    def test_no_shuffle(self, spark):
        from pyspark_airflow_weather_etl_spark.operators.governance import (
            split_corpus,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        plan = (
            split_corpus(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


def test_corpus_datasheet_counts_and_tiebreak(spark):
    """Volume/dup/lang metrics exact on a corpus built to exercise
    them: duplicate texts within one source, a 50/50 language tie
    (lexicographically-first lang must win), null-free integers."""
    from pyspark_airflow_weather_etl_spark.operators.governance import (
        corpus_datasheet,
    )

    rows = [
        (0, "a b c", "en", "web"),
        (1, "a b c", "en", "web"),      # exact dup of 0
        (2, "d e", "fr", "web"),
        (3, "x", "fr", "books"),
        (4, "y z", "de", "books"),      # books: fr/de tie -> 'de' wins
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )
    got = {r.source: r for r in corpus_datasheet(df).collect()}
    web, books = got["web"], got["books"]
    assert (web.n_docs, web.n_tokens, web.n_exact_dup_docs, web.n_langs) == (
        3, 8, 1, 2,
    )
    assert (web.top_lang, web.top_lang_docs) == ("en", 2)
    assert (books.n_docs, books.n_exact_dup_docs) == (2, 0)
    assert (books.top_lang, books.top_lang_docs) == ("de", 1)
    assert books.avg_doc_tokens == 1.5


def test_kanon_suppress_boundary(spark):
    """Groups exactly at k survive; k-1 groups are suppressed; row
    payloads come through untouched."""
    from pyspark_airflow_weather_etl_spark.operators.governance import (
        kanon_suppress,
    )

    rows = [("a", "x", i) for i in range(3)] + [
        ("b", "x", i) for i in range(2)
    ] + [("a", "y", 9)]
    df = spark.createDataFrame(rows, "q1 string, q2 string, payload long")
    kept = kanon_suppress(df, ["q1", "q2"], k=3).collect()
    assert {(r.q1, r.q2) for r in kept} == {("a", "x")}
    assert sorted(r.payload for r in kept) == [0, 1, 2]


def test_kanon_suppress_null_quasi_group(spark):
    """NULL quasi-identifier combinations are groups like any other:
    a (NULL, 'x') group of size >= k is KEPT (null-safe semi join),
    while a lone NULL-bearing row is still suppressed."""
    from pyspark_airflow_weather_etl_spark.operators.governance import (
        kanon_suppress,
    )

    rows = (
        [(None, "x", i) for i in range(3)]
        + [(None, "y", 7)]
        + [("a", None, i) for i in range(3)]
        + [("a", "z", 8)]
    )
    df = spark.createDataFrame(rows, "q1 string, q2 string, payload long")
    kept = kanon_suppress(df, ["q1", "q2"], k=3).collect()
    assert {(r.q1, r.q2) for r in kept} == {(None, "x"), ("a", None)}
    assert sorted(r.payload for r in kept) == [0, 0, 1, 1, 2, 2]


def test_oversample_sources_copies_and_determinism(spark):
    """Full copies exact, fractional copies deterministic (pure
    function of id), untouched sources pass through once, copy_ids
    dense from 0."""
    from pyspark_airflow_weather_etl_spark.operators.governance import (
        oversample_sources,
    )

    rows = [(i, "wiki") for i in range(200)] + [
        (i + 1000, "other") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = oversample_sources(df, {"wiki": (5, 2)})  # 2.5 epochs
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, oversample_sources(
        df.repartition(7), {"wiki": (5, 2)}).collect()))
    assert a == b  # partitioning-invariant
    per = {(r.doc_id): [] for r in out.collect()}
    for r in out.collect():
        per[r.doc_id].append(r.copy_id)
    for d, cids in per.items():
        assert sorted(cids) == list(range(len(cids)))  # dense from 0
        if d >= 1000:
            assert cids == [0]
        else:
            assert len(cids) in (2, 3)  # 2 full + maybe fractional
    n_wiki = sum(len(v) for d, v in per.items() if d < 1000)
    assert 200 * 2 <= n_wiki <= 200 * 3
    assert abs(n_wiki - 500) < 40  # ~2.5 epochs of 200


def test_split_leakage_audit_flags_only_straddling_pairs(spark):
    """A planted near-duplicate pair straddling the split boundary is
    reported; an equally-near pair inside one split is not."""
    from pyspark_airflow_weather_etl_spark.operators.dedup import (
        portable_minhash_pairs,
    )
    from pyspark_airflow_weather_etl_spark.operators.governance import (
        split_corpus,
    )
    from pyspark.sql import functions as F

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # find ids landing in each split under the audit salt
    probe = spark.createDataFrame(
        [(i,) for i in range(60)], "doc_id bigint"
    )
    lab = {
        r.doc_id: r.split
        for r in split_corpus(
            probe, splits=[("train", 50), ("holdout", 50)],
            salt="leakage-audit",
        ).collect()
    }
    train_ids = [d for d, s in lab.items() if s == "train"]
    hold_ids = [d for d, s in lab.items() if s == "holdout"]
    docs = spark.createDataFrame(
        [
            (train_ids[0], base),                    # near-dup pair
            (hold_ids[0], base + " extra"),          #   straddles
            (train_ids[1], "x1 " + base),            # near-dup pair
            (train_ids[2], "x2 " + base),            #   inside train
        ],
        "doc_id bigint, text string",
    )
    pairs = portable_minhash_pairs(docs, "doc_id", "text", threshold=0.5)
    labels = split_corpus(
        docs, splits=[("train", 50), ("holdout", 50)], salt="leakage-audit"
    ).select("doc_id", "split")
    la = labels.select(F.col("doc_id").alias("id_a"),
                       F.col("split").alias("split_a"))
    lb = labels.select(F.col("doc_id").alias("id_b"),
                       F.col("split").alias("split_b"))
    flagged = (
        pairs.join(la, "id_a").join(lb, "id_b")
        .where(F.col("split_a") != F.col("split_b"))
        .collect()
    )
    got = {tuple(sorted((r.id_a, r.id_b))) for r in flagged}
    assert tuple(sorted((train_ids[0], hold_ids[0]))) in got
    assert tuple(sorted((train_ids[1], train_ids[2]))) not in got
