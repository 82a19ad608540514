"""Count-min sketch (operators.sketch): one-sided estimates, the
heavy-hitter no-false-negative guarantee on a genuinely skewed
multiset, exact additivity across batch splits, artifact round-trip,
null-key safety, and the bounded-state build plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.operators import sketch as S


def _zipf_df(spark):
    """A deliberately skewed multiset: key-0 appears 512 times,
    key-1 256, ... key-9 once — true heavy hitters exist, unlike
    the near-uniform fixture tokens."""
    rows = []
    for i in range(10):
        rows.extend([(f"key-{i}",)] * (512 >> i))
    return spark.createDataFrame(rows, "k string")


def test_estimates_are_one_sided(spark):
    df = _zipf_df(spark)
    rows = S.cms_collect(S.cms_build(df, "k", w=8, d=4), w=8, d=4)
    true = {f"key-{i}": 512 >> i for i in range(10)}
    est = S.with_cms_estimate(
        df.select(F.col("k").alias("key")).distinct(), rows, "key", w=8
    )
    for r in est.collect():
        assert r["est_count"] >= true[r["key"]], r


def test_heavy_hitters_no_false_negatives(spark):
    """Every key with true count >= N/denom is reported — the CMS
    theorem, on a w=8 sketch where collisions are guaranteed."""
    df = _zipf_df(spark)
    n = df.count()  # 1023
    denom = 8  # threshold ~128: keys 0,1,2 are truly heavy
    truly_heavy = {f"key-{i}" for i in range(10) if (512 >> i) * denom >= n}
    got = {
        r["key"]
        for r in S.cms_heavy_hitters(df, "k", w=8, d=4, frac_denom=denom)
        .collect()
    }
    assert truly_heavy <= got
    # and the sketch is not degenerate: it did NOT report everything
    assert len(got) < 10


def test_additivity_matches_one_shot(spark):
    """Sketches over any batch split merge cell-wise to the
    bit-identical one-shot sketch — the incremental-maintenance
    contract."""
    df = _zipf_df(spark).withColumn(
        "b", F.conv(F.substring(F.md5("k"), 1, 4), 16, 10) % 3
    )
    one_shot = S.cms_collect(S.cms_build(df, "k", w=16, d=4), w=16, d=4)
    merged = [[0] * 16 for _ in range(4)]
    for b in range(3):
        part = S.cms_collect(
            S.cms_build(df.where(F.col("b") == b), "k", w=16, d=4), w=16, d=4
        )
        merged = S.cms_merge(merged, part)
    assert merged == one_shot


def test_save_load_round_trip(spark, tmp_path):
    rows = S.cms_collect(
        S.cms_build(_zipf_df(spark), "k", w=16, d=4), w=16, d=4
    )
    path = str(tmp_path / "cms")
    S.cms_save(spark, rows, 16, path)
    rows2, w2 = S.cms_load(spark, path)
    assert rows2 == rows and w2 == 16


def test_null_keys_skipped_and_estimate_null(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "k string")
    sk = S.cms_build(df, "k", w=8, d=2)
    assert sk.agg(F.sum("cnt")).first()[0] == 2 * 2  # 2 rows x d=2
    rows = S.cms_collect(sk, w=8, d=2)
    est = S.with_cms_estimate(df, rows, "k", w=8).collect()
    by_key = {r["k"]: r["est_count"] for r in est}
    assert by_key["a"] >= 2 and by_key[None] is None


def test_build_state_is_sketch_bounded(spark):
    """The 100 TB claim: the build aggregates on (row_idx, bucket) —
    at most d*w groups — so partial aggregation collapses the map
    side to sketch size before the exchange. Pinned by counting
    output rows (never exceeds d*w) and by partial aggregation in
    the plan."""
    df = _zipf_df(spark)
    sk = S.cms_build(df, "k", w=8, d=4)
    assert sk.count() <= 8 * 4
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "partial" in plan.lower()


class TestHLL:
    def test_accuracy_on_fixture_ngrams(self, spark):
        from pyspark_airflow_weather_etl_spark.operators.governance import (
            ngram_phrases,
        )

        from conftest import SF_DIR

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        fps = docs.select(
            F.explode(ngram_phrases("text", 5)).alias("g")
        ).select(F.md5("g").alias("fp"))
        true = fps.distinct().count()
        est = S.hll_estimate(S.hll_build(fps, "fp")).first()["estimate"]
        assert abs(est - true) / true < 0.2, (est, true)

    def test_merge_is_idempotent_max(self, spark):
        """Register MAX-merge: overlapping splits (every key appears
        in 2 of 3 parts) still merge to the one-shot registers —
        duplicates cannot inflate a distinct counter."""
        df = spark.createDataFrame(
            [(f"k-{i}",) for i in range(3000)], "k string"
        )
        one_shot = sorted(
            tuple(r) for r in S.hll_build(df, "k").collect()
        )
        parts = [
            df.where(F.conv(F.substring(F.md5("k"), 1, 4), 16, 10) % 3 != i)
            for i in range(3)
        ]  # each key lands in exactly two parts
        merged = S.hll_build(parts[0], "k")
        for p in parts[1:]:
            merged = S.hll_merge(merged, S.hll_build(p, "k"))
        assert sorted(tuple(r) for r in merged.collect()) == one_shot

    def test_linear_counting_small_range(self, spark):
        """With 40 keys in 256 buckets the raw estimator is biased;
        the small-range branch (linear counting over empty buckets)
        must engage and land close."""
        df = spark.createDataFrame(
            [(f"small-{i}",) for i in range(40)], "k string"
        )
        row = S.hll_estimate(S.hll_build(df, "k")).first()
        assert row["n_used_buckets"] < 256
        assert abs(row["estimate"] - 40) / 40 < 0.15, row["estimate"]

    def test_null_keys_skipped(self, spark):
        df = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
        regs = S.hll_build(df, "k")
        assert regs.count() <= 2
