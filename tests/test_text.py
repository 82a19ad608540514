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
