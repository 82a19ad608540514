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
