"""Language-ID heuristic on real sentences (the fixture corpus is
synthetic, so the oracle-parity test only proves 'und' there)."""

from __future__ import annotations

from pyspark_airflow_weather_etl_spark.operators.text import lang_id, shingles


def test_lang_id_real_sentences(spark):
    rows = [
        (1, "the cat sat on the mat and it was happy that day", "en"),
        (2, "el perro corre por la calle y los gatos del barrio", "es"),
        (3, "der hund und die katze sind nicht mit den kindern", "de"),
        (4, "le chien et les chats sont dans la maison pour une nuit", "fr"),
        (5, "blorp zzz qqq xxx", "und"),
    ]
    df = spark.createDataFrame(rows, ["id", "text", "expected"])
    out = df.select("expected", lang_id("text").alias("pred")).collect()
    for r in out:
        assert r.pred == r.expected, f"expected {r.expected}, got {r.pred}"


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a b c d")], ["id", "text"])
    got = {r.id: r.sh for r in df.select("id", shingles("text", 3).alias("sh")).collect()}
    assert got[1] == []
    assert got[2] == ["a b c", "b c d"]


def test_feature_hash_embeddings_drive_semantic_dedup(spark):
    """The model-free bridge end-to-end: duplicate-ish TEXTS (one
    token changed) must be caught by the VECTOR-space semantic dedup
    over feature-hashed embeddings — no external model anywhere."""
    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.similarity import (
        semantic_dedup,
    )
    from pyspark_airflow_weather_etl_spark.operators.text import (
        feature_hash_embed,
    )

    base = [
        " ".join(f"tok{(i * 7 + j) % 97}" for j in range(60))
        for i in range(30)
    ]
    rows = []
    vid = 0
    plant = []
    for i, t in enumerate(base):
        rows.append((vid, t))
        orig = vid
        vid += 1
        if i < 8:  # near-copy: one token swapped
            toks = t.split()
            toks[5] = "CHANGED"
            rows.append((vid, " ".join(toks)))
            plant.append((orig, vid))
            vid += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    DIM = 32
    long_form = feature_hash_embed(docs, "doc_id", "text", dim=DIM)
    # assemble the dense array<float> the vector operators expect
    dense = (
        long_form.groupBy("doc_id")
        .agg(
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda i: F.coalesce(
                    F.element_at(
                        F.map_from_entries(
                            F.collect_list(F.struct("dim_idx", "value"))
                        ),
                        i.cast("int"),
                    ),
                    F.lit(0),
                ).cast("float"),
            ).alias("embedding")
        )
        .withColumnRenamed("doc_id", "vec_id")
    )
    kept = {
        r.vec_id
        for r in semantic_dedup(
            dense, n_cells=4, threshold=0.9, sample_rows=64
        ).collect()
    }
    copies = [c for _, c in plant]
    recall = sum(c not in kept for c in copies) / len(copies)
    assert recall >= 0.9, f"near-copy texts not caught: recall {recall}"
    assert all(o in kept for o, _ in plant)


def test_dedup_passages_removes_boilerplate_corpus_wide(spark):
    from pyspark_airflow_weather_etl_spark.operators.text import (
        dedup_passages,
    )

    boiler = " ".join(f"b{i}" for i in range(8))  # exactly one passage
    rows = [
        (0, boiler + " " + " ".join(f"x{i}" for i in range(8))),
        (1, boiler + " " + " ".join(f"y{i}" for i in range(8))),
        (2, boiler),  # nothing but the boilerplate -> dropped entirely
        (3, " ".join(f"z{i}" for i in range(8))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in dedup_passages(docs, "doc_id", "text", passage_tokens=8)
        .collect()
    }
    # first occurrence (doc 0) keeps the boilerplate, doc 1 loses it
    assert out[0].clean_text.startswith(boiler)
    assert boiler not in out[1].clean_text
    assert out[1].n_dropped == 1
    # doc 2 was nothing but duplicates -> removed from the corpus
    assert 2 not in out
    # untouched doc passes through byte-identical
    assert out[3].clean_text == rows[3][1] and out[3].n_dropped == 0


class TestSubstringDedup:
    """dedup_substrings: the overlapping-window refinement whose
    reason to exist is the duplicate dedup_passages cannot see."""

    def test_boundary_straddling_duplicate_caught(self, spark):
        """A 32-token span duplicated across two docs, sitting at
        tokens 17..48 — straddling the 32-token passage boundary so
        each disjoint passage contains only HALF of it (different
        neighbours on each side -> different passage hashes ->
        dedup_passages keeps both copies). The strided windows (start
        17 = 1 + 16) cover the span exactly, so dedup_substrings
        removes the second copy."""
        from pyspark_airflow_weather_etl_spark.operators.text import (
            dedup_passages,
            dedup_substrings,
        )

        dup = " ".join(f"d{i}" for i in range(32))
        doc1 = (
            " ".join(f"a{i}" for i in range(16))
            + " " + dup + " "
            + " ".join(f"b{i}" for i in range(16))
        )
        doc2 = (
            " ".join(f"c{i}" for i in range(16))
            + " " + dup + " "
            + " ".join(f"e{i}" for i in range(16))
        )
        df = spark.createDataFrame(
            [(1, doc1), (2, doc2)], "doc_id long, text string"
        )
        # passages miss it: nothing dropped
        passages = {
            r.doc_id: r.n_dropped
            for r in dedup_passages(df, passage_tokens=32).collect()
        }
        assert passages == {1: 0, 2: 0}
        # strided windows catch it: doc2 loses exactly the 32 tokens
        got = {
            r.doc_id: (r.n_kept_tokens, r.n_dropped_tokens, r.clean_text)
            for r in dedup_substrings(
                df, window_tokens=32, stride=16
            ).collect()
        }
        assert got[1][:2] == (64, 0)
        assert got[2][:2] == (32, 32)
        assert "d0" not in got[2][2] and "c0" in got[2][2]
        assert "e0" in got[2][2]

    def test_short_docs_pass_through(self, spark):
        from pyspark_airflow_weather_etl_spark.operators.text import (
            dedup_substrings,
        )

        df = spark.createDataFrame(
            [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.clean_text, r.n_dropped_tokens)
            for r in dedup_substrings(df, window_tokens=32).collect()
        }
        assert got == {1: ("tiny doc", 0), 2: ("tiny doc", 0)}

    def test_within_doc_repeat_dropped(self, spark):
        """The second occurrence of a repeated span INSIDE one doc is
        removed too (same keep-first rule, (doc, start) order)."""
        from pyspark_airflow_weather_etl_spark.operators.text import (
            dedup_substrings,
        )

        span = " ".join(f"s{i}" for i in range(32))
        df = spark.createDataFrame(
            [(1, span + " " + span)], "doc_id long, text string"
        )
        r = dedup_substrings(df, window_tokens=32, stride=16).first()
        assert (r.n_kept_tokens, r.n_dropped_tokens) == (32, 32)
        assert r.clean_text == span


class TestLmBigramScore:
    """Corpus-LM surprisal scoring: hand-checkable micro-corpus."""

    def _score(self, spark, rows):
        from pyspark_airflow_weather_etl_spark.operators.text import (
            lm_bigram_score,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r.doc_id: r for r in lm_bigram_score(df).collect()}

    def test_counts_and_hapax(self, spark):
        import math

        got = self._score(
            spark,
            [
                (1, "a b c"),      # bigrams: (a,b) (b,c)
                (2, "a b d"),      # bigrams: (a,b) (b,d)
                (3, "x"),          # <2 tokens: all-zero row
            ],
        )
        # c(a,b)=2, c(b,c)=1, c(b,d)=1; c1(a·)=2, c1(b·)=2
        r1 = got[1]
        assert (r1.n_bigrams, r1.sum_bigram_freq, r1.n_hapax_bigrams) == (
            2,
            3,
            1,
        )
        # doc1 surprisal: (−ln(2/2) − ln(1/2))/2 = ln2/2
        assert abs(r1.avg_neg_logprob - round(math.log(2) / 2, 6)) < 1e-9
        r3 = got[3]
        assert (r3.n_bigrams, r3.sum_bigram_freq, r3.n_hapax_bigrams) == (
            0,
            0,
            0,
        )
        assert r3.avg_neg_logprob is None

    def test_boilerplate_scores_less_surprising(self, spark):
        """A document made of the corpus's most repeated phrase must
        score lower surprisal than a rare continuation of the SAME
        contexts. (Note the MLE-self-counting property: a bigram whose
        left context occurs nowhere else has P=1 — novelty registers
        in n_hapax_bigrams, while avg_neg_logprob measures how
        unpredictable each continuation is GIVEN a context the corpus
        knows; the salad doc here reuses 'the'/'quick' as contexts so
        its continuations compete with the common ones.)"""
        common = "the quick brown fox"
        rows = [(i, common) for i in range(10)]
        rows.append((100, "the zq quick vx"))
        got = self._score(spark, rows)
        assert got[0].avg_neg_logprob < got[100].avg_neg_logprob
        # the salad doc's bigrams occur nowhere else in the corpus
        assert got[100].n_hapax_bigrams == got[100].n_bigrams

    def test_feeds_quality_prune(self, spark):
        """Composition proof: the surprisal score drives the existing
        distribution-level quantile cut — drop the most-surprising
        decile by pruning on negated surprisal (quality_prune drops
        the LOWEST score fraction)."""
        from pyspark.sql import functions as F

        from pyspark_airflow_weather_etl_spark.operators.curation import (
            quality_prune,
        )
        from pyspark_airflow_weather_etl_spark.operators.text import (
            lm_bigram_score,
        )
        from pyspark_airflow_weather_etl_spark.sources.tables import (
            load_table,
        )
        from conftest import SF_DIR

        docs = load_table(spark, SF_DIR, "documents")
        scored = (
            lm_bigram_score(docs)
            .where(F.col("n_bigrams") > 0)
            .withColumn("neg_surprisal", -F.col("avg_neg_logprob"))
        )
        rows = {
            r.doc_id: r.avg_neg_logprob
            for r in scored.select("doc_id", "avg_neg_logprob").collect()
        }
        kept = {
            r.doc_id
            for r in quality_prune(
                scored, score_col="neg_surprisal"
            ).collect()
        }
        n_drop = len(rows) // 10
        worst = sorted(rows, key=lambda d: (-rows[d], -d))[:n_drop]
        assert kept == set(rows) - set(worst)


class TestGopherFilter:
    """Gopher composite quality gate (text.gopher_filter): each rule
    individually trips on a hand-built violator while a clean English
    paragraph passes everything."""

    def test_each_rule_trips_its_violator(self, spark):
        from pyspark_airflow_weather_etl_spark.operators.text import (
            gopher_filter,
        )

        clean = (
            "the cat and the dog have gone to the house of friends "
            "and that was fine with everyone because the weather "
            "was good and the road was short and they wanted to "
            "walk along the river with a basket of bread and fruit "
            "so that nobody would have to cook anything at all today"
        )
        rows = [
            (0, clean),                                   # passes all
            (1, "too short to count"),                    # word count
            (2, " ".join(["a"] * 60)),                    # mean len < 3
            (3, " ".join(["sesquipedalianism"] * 60)),    # mean len > 10
            (4, clean + " " + " ".join(["#"] * 40)),      # symbols
            (5, " ".join(["123", "456"] * 30)),           # alpha words
            (6, " ".join(["x1y", "z2w"] * 30)),           # stopwords
            (7, " ".join(["one two three"] * 40)),        # dup trigrams
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: r for r in gopher_filter(df).collect()
        }
        assert out[0].passes, {
            k: v for k, v in out[0].asDict().items() if k != "text"
        }
        assert not out[1].ok_word_count and not out[1].passes
        assert not out[2].ok_mean_word_len
        assert not out[3].ok_mean_word_len
        assert not out[4].ok_symbol_ratio
        assert not out[5].ok_alpha_words
        assert not out[6].ok_stopwords
        assert not out[7].ok_dup_trigrams and out[7].ok_word_count

    def test_flags_are_independent(self, spark):
        """A violator of one rule still reports honest values for the
        others — the audit columns don't collapse into the AND."""
        from pyspark_airflow_weather_etl_spark.operators.text import (
            gopher_filter,
        )

        df = spark.createDataFrame(
            [(0, "too short to count")], "doc_id long, text string"
        )
        r = gopher_filter(df).collect()[0]
        assert not r.ok_word_count
        assert r.ok_mean_word_len and r.ok_alpha_words


class TestPerplexityBuckets:
    """CCNet head/middle/tail bucketing (text.perplexity_buckets)."""

    def test_tiles_are_balanced_and_ordered(self, spark):
        from pyspark.sql import functions as F

        from pyspark_airflow_weather_etl_spark.operators.text import (
            perplexity_buckets,
        )

        from conftest import SF_DIR

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        out = perplexity_buckets(docs).cache()
        sizes = {
            r.bucket: r.n
            for r in out.groupBy("bucket").agg(
                F.count("*").alias("n")
            ).collect()
        }
        assert set(sizes) == {"head", "middle", "tail"}
        assert max(sizes.values()) - min(sizes.values()) <= 1
        # head is the most fluent tile: every head score <= every
        # tail score (ties broken by doc_id stay inside the rank)
        agg = {
            r.bucket: (r.lo, r.hi)
            for r in out.groupBy("bucket").agg(
                F.min("avg_neg_logprob").alias("lo"),
                F.max("avg_neg_logprob").alias("hi"),
            ).collect()
        }
        assert agg["head"][1] <= agg["middle"][0] or abs(
            agg["head"][1] - agg["middle"][0]
        ) == 0
        assert agg["middle"][1] <= agg["tail"][0] or abs(
            agg["middle"][1] - agg["tail"][0]
        ) == 0
        # ranks are a permutation of 1..n
        n = out.count()
        ranks = sorted(r.ppl_rank for r in out.collect())
        assert ranks == list(range(1, n + 1))
        out.unpersist()

    def test_deterministic_under_repartition(self, spark):
        from pyspark_airflow_weather_etl_spark.operators.text import (
            perplexity_buckets,
        )

        from conftest import SF_DIR

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        a = sorted(
            (r.doc_id, r.ppl_rank, r.bucket)
            for r in perplexity_buckets(docs.repartition(1)).collect()
        )
        b = sorted(
            (r.doc_id, r.ppl_rank, r.bucket)
            for r in perplexity_buckets(docs.repartition(13)).collect()
        )
        assert a == b


class TestRemoveFrequentPassages:
    """C4 boilerplate suppression (text.remove_frequent_passages)."""

    def test_frequent_passage_removed_everywhere(self, spark):
        from pyspark_airflow_weather_etl_spark.operators.text import (
            dedup_passages,
            remove_frequent_passages,
        )

        boiler = " ".join(f"b{i}" for i in range(8))
        rows = [
            (0, boiler + " " + " ".join(f"u0w{i}" for i in range(8))),
            (1, boiler + " " + " ".join(f"u1w{i}" for i in range(8))),
            (2, boiler + " " + " ".join(f"u2w{i}" for i in range(8))),
            (3, " ".join(f"solo{i}" for i in range(8))),
            (4, boiler),  # nothing but boilerplate -> drops
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: r
            for r in remove_frequent_passages(
                df, passage_tokens=8, min_docs=2
            ).collect()
        }
        # the shared passage vanished from EVERY doc, uniques survive
        assert set(out) == {0, 1, 2, 3}
        for d in (0, 1, 2):
            assert "b0" not in out[d].clean_text
            assert f"u{d}w0" in out[d].clean_text
            assert out[d].n_dropped == 1 and out[d].n_kept == 1
        assert out[3].n_dropped == 0
        # contrast: keep-first dedup leaves one copy alive
        kept_first = {
            r.doc_id: r.clean_text
            for r in dedup_passages(df, passage_tokens=8).collect()
        }
        assert any("b0" in t for t in kept_first.values())

    def test_min_docs_threshold(self, spark):
        from pyspark_airflow_weather_etl_spark.operators.text import (
            remove_frequent_passages,
        )

        pair = " ".join(f"p{i}" for i in range(4))
        rows = [(0, pair), (1, pair), (2, "only once here now")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        # min_docs=3: the pair passage appears in only 2 docs -> kept
        out = remove_frequent_passages(
            df, passage_tokens=4, min_docs=3
        ).collect()
        assert sorted(r.doc_id for r in out) == [0, 1, 2]
        assert all(r.n_dropped == 0 for r in out)


class TestLmReferenceScore:
    """Frozen reference-LM scoring (text.bigram_lm_train /
    lm_bigram_score_against) — the CCNet artifact deployment shape."""

    def test_oov_and_smoothing(self, spark):
        from pyspark_airflow_weather_etl_spark.operators.text import (
            bigram_lm_train,
            lm_bigram_score_against,
        )

        ref = spark.createDataFrame(
            [(0, "a b a b a c")], "doc_id long, text string"
        )
        model = bigram_lm_train(ref)
        # reference bigrams: (a,b)x2 (b,a)x2 (a,c)x1 -> V = {b,a,c} = 3
        assert model["vocab"] == 3
        pool = spark.createDataFrame(
            [
                (1, "a b"),        # seen bigram
                (2, "z q"),        # fully OOV
                (3, "a"),          # too short: null score
            ],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in lm_bigram_score_against(pool, model).collect()
        }
        import math

        # doc 1: P(b|a) = (2+1)/(3+3) -> -ln(1/2)
        assert out[1].n_oov_bigrams == 0
        assert out[1].avg_neg_logprob == round(math.log(2.0), 6)
        # doc 2: unseen context AND pair: (0+3)/(0+1) -> ln(3)
        assert out[2].n_oov_bigrams == 1
        assert out[2].avg_neg_logprob == round(math.log(3.0), 6)
        assert out[3].n_bigrams == 0 and out[3].avg_neg_logprob is None

    def test_artifact_round_trip(self, spark, tmp_path):
        from pyspark_airflow_weather_etl_spark.operators.text import (
            bigram_lm_load,
            bigram_lm_save,
            bigram_lm_train,
            lm_bigram_score_against,
        )

        from conftest import SF_DIR

        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(80)
        )
        model = bigram_lm_train(docs)
        bigram_lm_save(model, str(tmp_path / "lm"))
        back = bigram_lm_load(spark, str(tmp_path / "lm"))
        assert back["vocab"] == model["vocab"]
        a = sorted(
            map(tuple, lm_bigram_score_against(docs, model).collect())
        )
        b = sorted(
            map(tuple, lm_bigram_score_against(docs, back).collect())
        )
        assert a == b


def test_token_entropy_known_values(spark):
    """Hand-checked entropies: uniform distribution = ln(L); single
    repeated token = 0; a 2/1 mix matches the closed form."""
    import math

    from pyspark_airflow_weather_etl_spark.operators.text import (
        token_entropy,
    )

    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "a a a a"), (2, "a a b")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: (r.n_tokens, r.entropy_micro) for r in
           token_entropy(df).collect()}
    assert got[0] == (4, round(math.log(4) * 1e6))
    assert got[1] == (4, 0)
    # H = ln(3) - (2 ln 2)/3, with the per-type micro freeze replayed
    s = round(2 * math.log(2) * 1e6)
    want = round((math.log(3) - (s / 1e6) / 3) * 1e6)
    assert got[2] == (3, want)


def test_span_corruption_reconstructs_and_merges(spark):
    """The corruption pair must be LOSSLESS: splicing each sentinel's
    target tokens back into the inputs reproduces the original text;
    adjacent/overlapping spans merge into one sentinel; an unmasked
    doc yields the empty-target convention."""
    import re

    from pyspark_airflow_weather_etl_spark.operators.text import (
        span_corruption_pairs,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(40))) for i in range(30)],
        "doc_id bigint, text string",
    )
    rows = span_corruption_pairs(docs).collect()
    assert any(r.n_spans > 0 for r in rows)
    for r in rows:
        # parse targets into {k: tokens}
        spans = {}
        cur = None
        for tok in r.targets.split(" "):
            m = re.fullmatch(r"<extra_id_(\d+)>", tok)
            if m:
                cur = int(m.group(1))
                if cur != r.n_spans:
                    spans[cur] = []
            else:
                spans[cur].append(tok)
        assert len(spans) == r.n_spans
        rebuilt = []
        for tok in r.inputs.split(" "):
            m = re.fullmatch(r"<extra_id_(\d+)>", tok)
            if m:
                rebuilt.extend(spans[int(m.group(1))])
            elif tok:
                rebuilt.append(tok)
        original = " ".join(f"w{j}" for j in range(40))
        assert " ".join(rebuilt) == original, r.doc_id
        assert r.n_masked == sum(len(v) for v in spans.values())
        # sentinels in inputs are strictly increasing 0..n_spans-1
        ks = [int(m.group(1)) for m in re.finditer(r"<extra_id_(\d+)>", r.inputs)]
        assert ks == list(range(r.n_spans))


def test_strided_chunks_overlap_and_cover(spark):
    """Every adjacent window pair shares exactly window-stride tokens;
    concatenating each window's NEW tokens (stride-sized except the
    ragged tail) reproduces the document; stride==window degenerates
    to the fixed chunker."""
    from pyspark_airflow_weather_etl_spark.operators.text import (
        chunk_documents,
        chunk_documents_strided,
    )

    text = " ".join(f"w{j}" for j in range(50))
    df = spark.createDataFrame([(0, text)], "doc_id bigint, text string")
    rows = sorted(
        chunk_documents_strided(df, window_tokens=8, stride_tokens=5)
        .collect(),
        key=lambda r: r.chunk_idx,
    )
    toks = [r.chunk_text.split(" ") for r in rows]
    for a, b in zip(toks, toks[1:]):
        assert a[5:] == b[: len(a[5:])]  # 3-token overlap
    # coverage: window 0 plus each later window's post-overlap tokens
    rebuilt = toks[0][:]
    for t in toks[1:]:
        rebuilt.extend(t[3:])
    assert " ".join(rebuilt) == text
    # degenerate case equals the fixed chunker
    fixed = sorted(
        map(tuple, chunk_documents(df, chunk_tokens=8).collect())
    )
    degen = sorted(
        map(
            tuple,
            chunk_documents_strided(
                df, window_tokens=8, stride_tokens=8
            ).collect(),
        )
    )
    assert fixed == degen


def test_token_burstiness_poisson_vs_clumped(spark):
    """A token spread one-per-doc has variance-to-mean < 1 (below
    Poisson); a token clumped in one doc at the same total count is
    far burstier; exact values match the closed form."""
    from pyspark_airflow_weather_etl_spark.operators.text import (
        token_burstiness,
    )

    # 4 docs: 'u' once each (uniform); 'c' 4 times in one doc
    docs = spark.createDataFrame(
        [(0, "u c c c c"), (1, "u"), (2, "u"), (3, "u")],
        "doc_id bigint, text string",
    )
    got = {r.token: r for r in token_burstiness(docs).collect()}
    n = 4
    # u: S=4, Q=4 -> (4*4 - 16)/(4*4) = 0
    assert got["u"].burstiness == 0.0 and got["u"].df == 4
    # c: S=4, Q=16 -> (4*16 - 16)/(4*4) = 3.0
    assert got["c"].burstiness == 3.0 and got["c"].df == 1
    assert got["c"].total_tf == 4
