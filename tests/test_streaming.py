"""Batch↔stream parity: the streaming daily rollup must equal the
batch daily rollup over the same bounded input (the oracle-parity
suite already checks both against DuckDB; this checks them against
each other directly, including schema)."""

from __future__ import annotations

from pyspark_airflow_weather_etl_spark.plans.relational import events_daily_rollup
from pyspark_airflow_weather_etl_spark.streaming.rollup import (
    run_streaming_daily_rollup,
)

from conftest import SF_DIR


def test_stream_equals_batch(spark):
    batch = {
        (r.day, r.event_type): (r.min_value, r.max_value, r.avg_value,
                                r.sum_value, r.n_events)
        for r in events_daily_rollup(spark, SF_DIR).collect()
    }
    stream = {
        (r.day, r.event_type): (r.min_value, r.max_value, r.avg_value,
                                r.sum_value, r.n_events)
        for r in run_streaming_daily_rollup(spark, SF_DIR).collect()
    }
    assert batch == stream


def test_stream_stream_join_matches_batch(spark):
    """The watermarked view⨝purchase stream-stream join over the
    bounded fixture must equal the plain batch join with the same
    time bound (batch/stream parity)."""
    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.sources.tables import load_table
    from pyspark_airflow_weather_etl_spark.streaming.joins import (
        run_stream_stream_join,
    )

    got = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in run_stream_stream_join(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("vts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts",
    )
    want = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in v.join(
            p,
            (F.col("u") == F.col("user_id"))
            & (F.col("ts") >= F.col("vts"))
            & (F.col("ts") <= F.col("vts") + F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got == want and got


def test_incremental_dedup_invariant_to_arrival_order(spark, tmp_path):
    """The streaming decomposition must emit exactly the batch
    pipeline's pair set whatever order batches land in: orientation
    is normalized and the index grows monotonically, so each
    unordered pair appears exactly once, arrival order be damned."""
    import glob
    import os

    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.dedup import (
        portable_minhash_pairs,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table
    from pyspark_airflow_weather_etl_spark.streaming.incremental_dedup import (
        read_emitted_pairs,
        run_streaming_incremental_dedup,
    )

    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(300)
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    # permuted arrival: bucket 3 lands first, then 0, 4, 1, 2
    for slot, bucket in enumerate([3, 0, 4, 1, 2]):
        stage = str(tmp_path / f"stage_{bucket}")
        docs.where(F.col("doc_id") % 5 == bucket).coalesce(1).write.parquet(
            stage
        )
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{watch}/arrival_{slot:03d}.parquet"
        os.rename(part, dst)
        os.utime(dst, (1_700_000_000 + slot * 60,) * 2)
    run_streaming_incremental_dedup(
        spark,
        watch,
        str(tmp_path / "index"),
        str(tmp_path / "pairs"),
        docs.schema,
        checkpoint_dir=str(tmp_path / "ckpt"),
        threshold=0.5,
    )
    got = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in read_emitted_pairs(spark, str(tmp_path / "pairs")).collect()
    }
    want = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in portable_minhash_pairs(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert got == want
    assert got, "fixture slice must contain near-dup pairs"


def test_incremental_dedup_replay_is_idempotent(spark, tmp_path):
    """ADVICE r8: a crash between the pairs write and the checkpoint
    commit replays the batch. The batch-keyed index overwrite must
    leave the index EXACTLY as before (no double-appended signature
    rows), the replay must not emit self/mirrored pairs against its
    own crashed-attempt signatures, and future batches must emit each
    cross pair exactly once. Simulated by deleting the last commit
    marker from the checkpoint (keeping its offsets entry) — the
    precise crash point the at-least-once contract covers."""
    import glob
    import os

    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.dedup import (
        portable_minhash_pairs,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table
    from pyspark_airflow_weather_etl_spark.streaming.incremental_dedup import (
        read_emitted_pairs,
        run_streaming_incremental_dedup,
    )

    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(300)
    watch = str(tmp_path / "in")
    index = str(tmp_path / "index")
    pairs = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    def stage(buckets, slot0):
        for slot, bucket in enumerate(buckets, start=slot0):
            sdir = f"{watch}__stage_{bucket}"
            docs.where(F.col("doc_id") % 3 == bucket).coalesce(
                1
            ).write.mode("overwrite").parquet(sdir)
            part = glob.glob(f"{sdir}/part-*.parquet")[0]
            dst = f"{watch}/arrival_{slot:03d}.parquet"
            os.rename(part, dst)
            os.utime(dst, (1_700_000_000 + slot * 60,) * 2)

    stage([0, 1], 0)
    run_streaming_incremental_dedup(
        spark, watch, index, pairs, docs.schema,
        checkpoint_dir=ckpt, threshold=0.5,
    )
    index_before = sorted(
        (r.doc_id, r.batch, tuple(r.sig))
        for r in spark.read.parquet(index).collect()
    )
    emitted_before = read_emitted_pairs(spark, pairs).count()
    # crash simulation: batch 1's work is on disk but uncommitted
    # (the local FS keeps a .crc sidecar that must go with it, or the
    # commit rewrite's rename fails)
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_streaming_incremental_dedup(
        spark, watch, index, pairs, docs.schema,
        checkpoint_dir=ckpt, threshold=0.5,
    )
    index_after = sorted(
        (r.doc_id, r.batch, tuple(r.sig))
        for r in spark.read.parquet(index).collect()
    )
    assert index_after == index_before, "replay duplicated index rows"
    replayed = read_emitted_pairs(spark, pairs)
    assert replayed.where(F.col("id_a") >= F.col("id_b")).count() == 0, (
        "replay emitted self/mirrored pairs against its own signatures"
    )
    assert replayed.count() >= emitted_before  # at-least-once re-emit
    # a future batch against the replayed index: each pair exactly once
    stage([2], 2)
    run_streaming_incremental_dedup(
        spark, watch, index, pairs, docs.schema,
        checkpoint_dir=ckpt, threshold=0.5,
    )
    final = read_emitted_pairs(spark, pairs)
    want = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in portable_minhash_pairs(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    got = {
        (r.id_a, r.id_b): round(r.jaccard, 9) for r in final.collect()
    }
    assert got == want and got
    # rows from the post-replay batch (docs in bucket 2) are unique —
    # duplicated index rows would have duplicated every one of them
    b2 = {r.doc_id for r in docs.where(F.col("doc_id") % 3 == 2).collect()}
    from collections import Counter

    cnt = Counter(
        (r.id_a, r.id_b)
        for r in final.collect()
        if r.id_a in b2 or r.id_b in b2
    )
    assert cnt and all(v == 1 for v in cnt.values()), cnt.most_common(3)


def test_incremental_dedup_survives_index_compaction(spark, tmp_path):
    """The at-rest signature index accretes one small append per
    micro-batch — exactly what compact_table exists for. Compacting
    the index between arrivals must be invisible to the dedup loop:
    same emitted pair set as the uncompacted run."""
    import glob
    import os

    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.dedup import (
        portable_minhash_pairs,
    )
    from pyspark_airflow_weather_etl_spark.operators.scale import (
        compact_table,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table
    from pyspark_airflow_weather_etl_spark.streaming.incremental_dedup import (
        read_emitted_pairs,
        run_streaming_incremental_dedup,
    )

    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(300)

    def stage(watch, buckets, base_ts, slot0):
        os.makedirs(watch, exist_ok=True)
        for slot, bucket in enumerate(buckets, start=slot0):
            sdir = f"{watch}__stage_{bucket}"
            docs.where(F.col("doc_id") % 4 == bucket).coalesce(
                1
            ).write.mode("overwrite").parquet(sdir)
            part = glob.glob(f"{sdir}/part-*.parquet")[0]
            dst = f"{watch}/arrival_{slot:03d}.parquet"
            os.rename(part, dst)
            os.utime(dst, (base_ts + slot * 60,) * 2)

    watch = str(tmp_path / "in")
    index = str(tmp_path / "index")
    pairs = str(tmp_path / "pairs")
    # first two batches
    stage(watch, [0, 1], 1_700_000_000, 0)
    run_streaming_incremental_dedup(
        spark, watch, index, pairs, docs.schema,
        checkpoint_dir=str(tmp_path / "ckpt"), threshold=0.5,
    )
    # the index is hive-partitioned by batch id (replay idempotency);
    # compact it as the partitioned table it is
    b, a = compact_table(
        spark, index, partition_cols=("batch",), target_file_bytes=1 << 30
    )
    assert a < b, "two appended batches should compact to fewer files"
    # two more batches after compaction, same checkpoint resumes
    stage(watch, [2, 3], 1_700_000_400, 2)
    run_streaming_incremental_dedup(
        spark, watch, index, pairs, docs.schema,
        checkpoint_dir=str(tmp_path / "ckpt"), threshold=0.5,
    )
    got = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in read_emitted_pairs(spark, pairs).collect()
    }
    want = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in portable_minhash_pairs(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert got == want


def test_quality_monitor_alerts_on_degraded_batch(spark, tmp_path):
    """A batch of stub documents (short texts beyond the 1/10
    fraction) must raise the alert flag; a healthy batch must not."""
    import glob
    import os

    from pyspark_airflow_weather_etl_spark.streaming.quality_monitor import (
        read_quality_metrics,
        run_streaming_quality_monitor,
    )

    healthy = [(i, "tok " * 120) for i in range(100, 120)]
    degraded = [(i, "x") for i in range(200, 210)] + [
        (i, "tok " * 120) for i in range(210, 215)
    ]
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    for slot, rows in enumerate([healthy, degraded]):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        stage = str(tmp_path / f"stage_{slot}")
        df.coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{watch}/b{slot}.parquet"
        os.rename(part, dst)
        os.utime(dst, (1_700_000_000 + slot * 60,) * 2)
    run_streaming_quality_monitor(
        spark,
        watch,
        str(tmp_path / "metrics"),
        "doc_id long, text string",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    rows = {
        r.batch_key: r
        for r in read_quality_metrics(
            spark, str(tmp_path / "metrics")
        ).collect()
    }
    assert rows[100].alert is False and rows[100].n_short == 0
    assert rows[200].alert is True and rows[200].n_short == 10


def test_streaming_semantic_dedup_replay_idempotent(spark, tmp_path):
    """The semantic twin of the minhash replay test: a crash between
    the drops write and the checkpoint commit replays the batch. The
    batch-keyed dynamic-overwrite append must leave the index
    row-set identical, and the final kept corpus must equal the
    one-shot fixed-cells run."""
    import glob
    import os

    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators import similarity as S
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table
    from pyspark_airflow_weather_etl_spark.streaming.semantic_dedup import (
        read_kept,
        run_streaming_semantic_dedup,
    )

    from conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    watch = str(tmp_path / "in")
    idx = str(tmp_path / "idx")
    drops = str(tmp_path / "drops")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)
    for slot, b in enumerate([1, 0, 2]):
        stage = str(tmp_path / f"st_{b}")
        emb.where(F.col("vec_id") % 3 == b).coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{watch}/batch_{slot:03d}.parquet"
        os.rename(part, dst)
        os.utime(dst, (1_700_000_000 + slot * 60,) * 2)
    S.semantic_centroids_write_fixed(emb, idx, n_centroids=8)
    run_streaming_semantic_dedup(
        spark, watch, idx, drops, emb.schema,
        checkpoint_dir=ckpt, threshold=0.4,
    )
    index_before = sorted(
        (r.vec_id, r.batch, r.ivf_cell)
        for r in spark.read.parquet(f"{idx}/rows").collect()
    )
    # crash simulation: replay the LAST batch
    os.remove(os.path.join(ckpt, "commits", "2"))
    crc = os.path.join(ckpt, "commits", ".2.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_streaming_semantic_dedup(
        spark, watch, idx, drops, emb.schema,
        checkpoint_dir=ckpt, threshold=0.4,
    )
    index_after = sorted(
        (r.vec_id, r.batch, r.ivf_cell)
        for r in spark.read.parquet(f"{idx}/rows").collect()
    )
    assert index_after == index_before, "replay changed the index"
    kept = {r.vec_id for r in read_kept(spark, idx, drops).collect()}
    want = {
        r.vec_id
        for r in S.semantic_dedup_fixed_cells(
            emb, n_centroids=8, threshold=0.4
        ).collect()
    }
    assert kept == want and kept


def test_streaming_encode_replay_and_batch_parity(spark, tmp_path):
    """Streaming tokenize-to-ids (streaming.encode): (a) the union of
    per-batch encodes equals the one-shot batch encode EXACTLY (fixed
    at-rest vocab ⇒ stateless map ⇒ decomposition-invariant), and
    (b) a crash-replay (commit marker deleted, offsets kept)
    overwrites its own batch partition instead of double-appending —
    the reader needs no distinct."""
    import glob
    import os

    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.text import (
        build_vocab,
        encode_documents,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table
    from pyspark_airflow_weather_etl_spark.streaming.encode import (
        read_encoded,
        run_streaming_encode,
    )

    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    watch = str(tmp_path / "in")
    vocab_path = str(tmp_path / "vocab")
    out = str(tmp_path / "encoded")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)
    vocab = build_vocab(docs, "text", max_vocab=20)
    vocab.write.parquet(vocab_path)

    def stage(buckets, slot0):
        for slot, bucket in enumerate(buckets, start=slot0):
            sdir = f"{watch}__stage_{bucket}"
            docs.where(F.col("doc_id") % 3 == bucket).coalesce(
                1
            ).write.mode("overwrite").parquet(sdir)
            part = glob.glob(f"{sdir}/part-*.parquet")[0]
            dst = f"{watch}/arrival_{slot:03d}.parquet"
            os.rename(part, dst)
            os.utime(dst, (1_700_000_000 + slot * 60,) * 2)

    stage([0, 1], 0)
    run_streaming_encode(
        spark, watch, vocab_path, out, docs.schema, checkpoint_dir=ckpt
    )
    before = sorted(
        (r.doc_id, tuple(r.token_ids), r.n_tokens)
        for r in read_encoded(spark, out).collect()
    )
    # crash: batch 1's output is on disk but the commit is gone
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_streaming_encode(
        spark, watch, vocab_path, out, docs.schema, checkpoint_dir=ckpt
    )
    after = sorted(
        (r.doc_id, tuple(r.token_ids), r.n_tokens)
        for r in read_encoded(spark, out).collect()
    )
    assert after == before, "replay duplicated or altered encoded rows"
    # a later batch, then full-corpus parity with the one-shot encode
    stage([2], 2)
    run_streaming_encode(
        spark, watch, vocab_path, out, docs.schema, checkpoint_dir=ckpt
    )
    got = sorted(
        (r.doc_id, tuple(r.token_ids), r.n_tokens)
        for r in read_encoded(spark, out).collect()
    )
    want = sorted(
        (r.doc_id, tuple(r.token_ids), r.n_tokens)
        for r in encode_documents(docs, vocab).collect()
    )
    assert got == want and got


def test_streaming_scd2_replay_and_bucket_stability(spark, tmp_path):
    """Streaming SCD2 maintenance (streaming.scd2): (a) the maintained
    table equals the one-shot batch compaction after every batch, (b)
    a crash-replay (commit marker deleted) converges to the same table
    — the refresh is a pure function of the at-rest raw store — and
    (c) a batch touching only some key-buckets leaves the other
    buckets' files unmodified (bucket-granular refresh, not a full
    rewrite)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.merge import (
        scd2_compact,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table
    from pyspark_airflow_weather_etl_spark.streaming.scd2 import (
        read_history,
        run_streaming_scd2,
    )

    from conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").limit(400).cache()
    watch = str(tmp_path / "in")
    raw = str(tmp_path / "raw")
    hist = str(tmp_path / "history")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    def stage(buckets, slot0, mod=3):
        for slot, bucket in enumerate(buckets, start=slot0):
            sdir = f"{watch}__stage_{bucket}"
            ev.where(F.col("event_id") % mod == bucket).coalesce(
                1
            ).write.mode("overwrite").parquet(sdir)
            part = glob.glob(f"{sdir}/part-*.parquet")[0]
            dst = f"{watch}/arrival_{slot:03d}.parquet"
            os.rename(part, dst)
            os.utime(dst, (1_700_000_000 + slot * 60,) * 2)

    def snap(df):
        return sorted(
            (r.user_id, r.event_type, r.valid_from_us, r.valid_to_us,
             r.version)
            for r in df.collect()
        )

    stage([0, 1], 0)
    run_streaming_scd2(
        spark, watch, raw, hist, ev.schema, checkpoint_dir=ckpt
    )
    seen = ev.where(F.col("event_id") % 3 != 2)
    assert snap(read_history(spark, hist)) == snap(
        scd2_compact(seen, "user_id", "event_type", "ts", "event_id")
    )
    before = snap(read_history(spark, hist))
    # crash: batch 1 committed its writes but not the checkpoint
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_streaming_scd2(
        spark, watch, raw, hist, ev.schema, checkpoint_dir=ckpt
    )
    assert snap(read_history(spark, hist)) == before
    # bucket stability: a single-user batch touches ONE bucket; every
    # other bucket's files keep their mtimes
    some_user = ev.select("user_id").first()[0]
    one = ev.where(
        (F.col("event_id") % 3 == 2) & (F.col("user_id") == some_user)
    )
    assert one.count() > 0
    sdir = f"{watch}__stage_one"
    one.coalesce(1).write.mode("overwrite").parquet(sdir)
    part = glob.glob(f"{sdir}/part-*.parquet")[0]
    dst = f"{watch}/arrival_100.parquet"
    os.rename(part, dst)
    os.utime(dst, (1_700_009_000,) * 2)
    mtimes_before = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{hist}/kb=*/*.parquet")
    }
    run_streaming_scd2(
        spark, watch, raw, hist, ev.schema, checkpoint_dir=ckpt
    )
    from pyspark_airflow_weather_etl_spark.streaming.scd2 import (
        _with_bucket,
    )

    touched_kb = (
        _with_bucket(one, "user_id", 8).select("kb").first()[0]
    )
    untouched = {
        p: m
        for p, m in mtimes_before.items()
        if f"kb={touched_kb}/" not in p
    }
    after = {p: os.path.getmtime(p) for p in untouched}
    assert after == untouched, "untouched buckets were rewritten"
    # and the table still equals the full batch compaction of all seen
    seen2 = ev.where(
        (F.col("event_id") % 3 != 2)
        | (F.col("user_id") == some_user)
    )
    assert snap(read_history(spark, hist)) == snap(
        scd2_compact(seen2, "user_id", "event_type", "ts", "event_id")
    )
    ev.unpersist()


def test_streaming_pseudonymize_replay_and_vault_stability(spark, tmp_path):
    """Streaming pseudonymization (streaming.pseudonymize): (a) the
    vault assigns first-seen-batch-then-key surrogates and never
    remaps across waves, (b) a crash-replay (commit marker deleted)
    converges to the same vault AND the same output rows, (c) a batch
    with no new keys does not publish a new vault version."""
    import glob
    import os

    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.governance import (
        vault_read,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table
    from pyspark_airflow_weather_etl_spark.streaming.pseudonymize import (
        read_pseudonymized,
        run_streaming_pseudonymize,
    )

    from conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").limit(400).cache()
    watch = str(tmp_path / "in")
    vault = str(tmp_path / "vault")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    def stage(bucket, slot, mod=3):
        sdir = str(tmp_path / f"stage_{slot}")
        ev.where(F.col("event_id") % mod == bucket).coalesce(
            1
        ).write.mode("overwrite").parquet(sdir)
        part = glob.glob(f"{sdir}/part-*.parquet")[0]
        dst = f"{watch}/arrival_{slot:03d}.parquet"
        os.rename(part, dst)
        os.utime(dst, (1_700_000_000 + slot * 60,) * 2)

    def vsnap():
        return sorted(
            (r.user_id, r.surrogate_id)
            for r in vault_read(spark, vault).collect()
        )

    def osnap():
        return sorted(
            (r.event_id, r.surrogate_id, r.batch)
            for r in read_pseudonymized(spark, out).collect()
        )

    stage(0, 0)
    stage(1, 1)
    run_streaming_pseudonymize(
        spark, watch, vault, out, ev.schema, checkpoint_dir=ckpt
    )
    v1, o1 = vsnap(), osnap()
    # surrogates dense in first-seen order
    assert sorted(s for _, s in v1) == list(range(1, len(v1) + 1))
    # crash-replay: batch 1 wrote but did not commit
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_streaming_pseudonymize(
        spark, watch, vault, out, ev.schema, checkpoint_dir=ckpt
    )
    assert vsnap() == v1 and osnap() == o1
    # third wave: mostly-seen users -> existing surrogates unchanged
    stage(2, 2)
    run_streaming_pseudonymize(
        spark, watch, vault, out, ev.schema, checkpoint_dir=ckpt
    )
    v2 = dict(vsnap())
    for u, s in v1:
        assert v2[u] == s, "an existing surrogate remapped"
    # every event of the full set is present exactly once
    assert len(osnap()) == ev.count()
    # no-new-keys wave: re-deliver bucket 0's events as a new file —
    # vault version must NOT churn
    versions_before = sorted(glob.glob(f"{vault}/v-*"))
    stage(0, 3)
    run_streaming_pseudonymize(
        spark, watch, vault, out, ev.schema, checkpoint_dir=ckpt
    )
    assert sorted(glob.glob(f"{vault}/v-*")) == versions_before
    assert dict(vsnap()) == v2
    ev.unpersist()


def test_streaming_decontaminate_replay_and_quarantine(spark, tmp_path):
    """Streaming decontamination (streaming.decontaminate): (a) kept ∪
    quarantined partitions the pool exactly, with quarantine counts
    matching the batch operator's verdicts, (b) a crash-replay
    (commit marker deleted) converges to the same kept set, (c) a
    verbatim benchmark copy arriving in a later batch is quarantined."""
    import glob
    import os

    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.governance import (
        decontaminate_against,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table
    from pyspark_airflow_weather_etl_spark.streaming.decontaminate import (
        read_kept_documents,
        read_quarantine,
        run_streaming_decontaminate,
        write_benchmark_digests,
    )

    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(150).cache()
    bench = docs.where(F.col("doc_id") % 13 == 0).select("doc_id", "text")
    pool = docs.where(F.col("doc_id") % 13 != 0)
    dig = str(tmp_path / "digests")
    watch = str(tmp_path / "in")
    kept_p = str(tmp_path / "kept")
    quar = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)
    write_benchmark_digests(bench, dig, "text", n=5)

    def stage(df, slot):
        sdir = str(tmp_path / f"stage_{slot}")
        df.coalesce(1).write.mode("overwrite").parquet(sdir)
        part = glob.glob(f"{sdir}/part-*.parquet")[0]
        dst = f"{watch}/arrival_{slot:03d}.parquet"
        os.rename(part, dst)
        os.utime(dst, (1_700_000_000 + slot * 60,) * 2)

    stage(pool.where(F.col("doc_id") % 2 == 0), 0)
    stage(pool.where(F.col("doc_id") % 2 == 1), 1)
    run_streaming_decontaminate(
        spark, watch, dig, kept_p, quar, pool.schema,
        checkpoint_dir=ckpt,
    )
    kept_ids = {
        r.doc_id for r in read_kept_documents(spark, kept_p).collect()
    }
    q_rows = {r.doc_id: r for r in read_quarantine(spark, quar).collect()}
    pool_ids = {r.doc_id for r in pool.select("doc_id").collect()}
    assert kept_ids | set(q_rows) == pool_ids
    assert kept_ids.isdisjoint(q_rows)
    # quarantine verdicts match the batch operator (kept side there)
    batch_kept = {
        r.doc_id
        for r in decontaminate_against(pool, bench, n=5).collect()
    }
    assert kept_ids == batch_kept
    before = kept_ids
    # crash-replay: batch 1 wrote but did not commit
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_streaming_decontaminate(
        spark, watch, dig, kept_p, quar, pool.schema,
        checkpoint_dir=ckpt,
    )
    assert {
        r.doc_id for r in read_kept_documents(spark, kept_p).collect()
    } == before
    # a verbatim benchmark copy in a later batch is quarantined
    vb = bench.orderBy("doc_id").first()
    copy = spark.createDataFrame(
        [(900009, vb.text, "en", "src0", len(vb.text))], pool.schema
    )
    stage(copy, 2)
    run_streaming_decontaminate(
        spark, watch, dig, kept_p, quar, pool.schema,
        checkpoint_dir=ckpt,
    )
    q2 = {r.doc_id: r for r in read_quarantine(spark, quar).collect()}
    assert 900009 in q2
    assert q2[900009].n_contaminated * 10 > q2[900009].n_ngrams
    assert 900009 not in {
        r.doc_id for r in read_kept_documents(spark, kept_p).collect()
    }
    docs.unpersist()


def test_streaming_decontaminate_custom_id_col(spark, tmp_path):
    """A non-default id column (string-typed) round-trips through the
    quarantine reader: the schema is derived from the written files,
    and the empty-table fallback honors id_col/id_type."""
    import glob
    import os

    from pyspark_airflow_weather_etl_spark.streaming.decontaminate import (
        read_quarantine,
        run_streaming_decontaminate,
        write_benchmark_digests,
    )

    bench = spark.createDataFrame(
        [("b1", "alpha beta gamma delta epsilon zeta eta theta")],
        "key string, text string",
    )
    pool = spark.createDataFrame(
        [
            ("d-clean", "one two three four five six seven eight nine"),
            ("d-dirty", "alpha beta gamma delta epsilon zeta eta theta"),
        ],
        "key string, text string",
    )
    dig = str(tmp_path / "digests")
    watch = str(tmp_path / "in")
    kept_p = str(tmp_path / "kept")
    quar = str(tmp_path / "quarantine")
    os.makedirs(watch)
    write_benchmark_digests(bench, dig, "text", n=5)
    sdir = str(tmp_path / "stage")
    pool.coalesce(1).write.mode("overwrite").parquet(sdir)
    os.rename(
        glob.glob(f"{sdir}/part-*.parquet")[0],
        f"{watch}/arrival_000.parquet",
    )
    # empty quarantine (no files yet): fallback schema honors id_col
    empty = read_quarantine(
        spark, quar, id_col="key", id_type="string"
    )
    assert empty.schema["key"].dataType.simpleString() == "string"
    assert empty.count() == 0
    run_streaming_decontaminate(
        spark, watch, dig, kept_p, quar, pool.schema,
        id_col="key", text_col="text",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q = {
        r.key: r
        for r in read_quarantine(
            spark, quar, id_col="key", id_type="string"
        ).collect()
    }
    assert set(q) == {"d-dirty"}
    assert q["d-dirty"].n_contaminated > 0


def test_streaming_classify_parity_and_replay(spark, tmp_path):
    """Streaming classifier scoring (streaming.classify): (a) union of
    per-batch outputs equals the one-shot batch scoring+lottery for
    this decomposition, (b) a crash-replay (commit marker deleted)
    converges to the same output (batch-keyed dynamic overwrite)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators import (
        classifier as C,
    )
    from pyspark_airflow_weather_etl_spark.streaming.classify import (
        read_scored,
        run_streaming_classify,
    )

    from conftest import SF_DIR

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(120)
        .select("doc_id", "text")
        .cache()
    )
    model = C.train_quality_classifier(
        docs.withColumn("y", (F.col("doc_id") % 2).cast("int")),
        "y",
        dim=16,
        iters=3,
    )
    C.save_classifier(spark, model, str(tmp_path / "model"))
    watch = str(tmp_path / "in")
    out = str(tmp_path / "scored")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)
    for i in range(2):
        sdir = str(tmp_path / f"stage_{i}")
        docs.where(F.col("doc_id") % 2 == i).coalesce(1).write.parquet(sdir)
        dst = f"{watch}/arrival_{i:03d}.parquet"
        os.rename(glob.glob(f"{sdir}/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + i * 60,) * 2)
    run_streaming_classify(
        spark, watch, str(tmp_path / "model"), out, docs.schema,
        checkpoint_dir=ckpt,
    )
    got = sorted(
        (r.doc_id, r.score, r.kept)
        for r in read_scored(spark, out).collect()
    )
    batch = C.pareto_flags(C.score_quality_classifier(docs, model))
    want = sorted(
        (r.doc_id, r.score, r.kept) for r in batch.collect()
    )
    assert got == want
    # crash-replay: drop batch 1's commit, rerun, byte-identical set
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_streaming_classify(
        spark, watch, str(tmp_path / "model"), out, docs.schema,
        checkpoint_dir=ckpt,
    )
    again = sorted(
        (r.doc_id, r.score, r.kept)
        for r in read_scored(spark, out).collect()
    )
    assert again == got
    docs.unpersist()


def test_streaming_lm_score_parity_and_replay(spark, tmp_path):
    """Streaming frozen-LM scoring (streaming.lm_monitor): union of
    per-batch outputs equals the one-shot batch scoring, and a
    crash-replay converges to the same output."""
    import glob
    import os

    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.text import (
        bigram_lm_save,
        bigram_lm_train,
        lm_bigram_score_against,
    )
    from pyspark_airflow_weather_etl_spark.streaming.lm_monitor import (
        read_lm_scores,
        run_streaming_lm_score,
    )

    from conftest import SF_DIR

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(100)
        .select("doc_id", "text")
        .cache()
    )
    model = bigram_lm_train(docs.where(F.col("doc_id") % 3 == 0))
    bigram_lm_save(model, str(tmp_path / "lm"))
    watch = str(tmp_path / "in")
    out = str(tmp_path / "scored")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)
    for i in range(2):
        sdir = str(tmp_path / f"stage_{i}")
        docs.where(F.col("doc_id") % 2 == i).coalesce(1).write.parquet(sdir)
        dst = f"{watch}/arrival_{i:03d}.parquet"
        os.rename(glob.glob(f"{sdir}/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + i * 60,) * 2)
    run_streaming_lm_score(
        spark, watch, str(tmp_path / "lm"), out, docs.schema,
        checkpoint_dir=ckpt,
    )
    got = sorted(map(tuple, read_lm_scores(spark, out).collect()))
    want = sorted(
        map(tuple, lm_bigram_score_against(docs, model).collect())
    )
    assert got == want
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_streaming_lm_score(
        spark, watch, str(tmp_path / "lm"), out, docs.schema,
        checkpoint_dir=ckpt,
    )
    assert sorted(map(tuple, read_lm_scores(spark, out).collect())) == got
    docs.unpersist()


def test_streaming_pca_moments_bit_identical_and_replay(spark, tmp_path):
    """Streaming PCA (streaming.pca_stream): the artifact cut from
    the streamed moment store is BIT-IDENTICAL to the one-shot batch
    train (integer moments are exactly additive), and a crash-replay
    (commit marker deleted) cannot double-count a batch."""
    import glob
    import os

    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators import pca as P
    from pyspark_airflow_weather_etl_spark.streaming.pca_stream import (
        pca_train_from_store,
        run_streaming_pca_moments,
    )

    from conftest import SF_DIR

    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .limit(150)
        .cache()
    )
    watch = str(tmp_path / "in")
    store = str(tmp_path / "moments")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)
    for i in range(3):
        sdir = str(tmp_path / f"stage_{i}")
        emb.where(F.col("vec_id") % 3 == i).coalesce(1).write.parquet(sdir)
        dst = f"{watch}/arrival_{i:03d}.parquet"
        os.rename(glob.glob(f"{sdir}/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + i * 60,) * 2)
    run_streaming_pca_moments(
        spark, watch, store, emb.schema, "embedding", d=64,
        checkpoint_dir=ckpt,
    )
    streamed = pca_train_from_store(spark, store, d=64, k=8)
    batch = P.pca_train(emb, "embedding", k=8)
    assert streamed == batch  # bit-identical artifact
    # crash-replay: batch 1 wrote but did not commit; replay must
    # overwrite its own partition, never double-count
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_streaming_pca_moments(
        spark, watch, store, emb.schema, "embedding", d=64,
        checkpoint_dir=ckpt,
    )
    assert pca_train_from_store(spark, store, d=64, k=8) == batch
    emb.unpersist()


def test_streaming_cms_bit_identical_and_replay(spark, tmp_path):
    """Streaming count-min sketch (streaming.cms_stream): the sketch
    cut from the per-batch cell store is BIT-IDENTICAL to the
    one-shot batch cms_build over the union (integer cells are
    exactly additive), and a crash-replay (commit marker deleted)
    cannot double-count a batch."""
    import glob
    import os

    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.sketch import cms_build
    from pyspark_airflow_weather_etl_spark.operators.text import tokens
    from pyspark_airflow_weather_etl_spark.streaming.cms_stream import (
        cms_cells_from_store,
        run_streaming_cms,
    )

    from conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()

    def key_fn(df):
        return df.select(F.explode(tokens("text")).alias("__key")).where(
            F.length("__key") > 0
        )

    watch = str(tmp_path / "in")
    store = str(tmp_path / "cells")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)
    for i in range(3):
        sdir = str(tmp_path / f"stage_{i}")
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(sdir)
        dst = f"{watch}/arrival_{i:03d}.parquet"
        os.rename(glob.glob(f"{sdir}/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + i * 60,) * 2)
    run_streaming_cms(
        spark, watch, store, docs.schema, key_fn, w=64, d=4,
        checkpoint_dir=ckpt,
    )
    streamed = sorted(
        tuple(r) for r in cms_cells_from_store(spark, store).collect()
    )
    one_shot = sorted(
        tuple(r) for r in cms_build(key_fn(docs), "__key", w=64, d=4).collect()
    )
    assert streamed == one_shot
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_streaming_cms(
        spark, watch, store, docs.schema, key_fn, w=64, d=4,
        checkpoint_dir=ckpt,
    )
    assert (
        sorted(tuple(r) for r in cms_cells_from_store(spark, store).collect())
        == one_shot
    )
    docs.unpersist()


def test_streaming_bloom_idempotent_replay_and_duplicates(spark, tmp_path):
    """Streaming Bloom store (streaming.bloom_stream): the filter cut
    from the store is bit-identical to the one-shot build; bitwise OR
    is idempotent, so BOTH a crash-replay and an outright duplicated
    arrival file leave the filter unchanged — at-least-once delivery
    cannot corrupt membership."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators import bloom as B
    from pyspark_airflow_weather_etl_spark.streaming.bloom_stream import (
        bloom_words_from_store,
        run_streaming_bloom,
    )

    from conftest import SF_DIR

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where(F.col("doc_id") % 13 == 0)
        .cache()
    )
    fps = docs.select(F.md5("text").alias("__key"))
    m_bits = B.sized_m_bits(fps.count())
    one_shot = B.bloom_collect(
        B.bloom_build(fps, "__key", m_bits, 4), m_bits
    )

    def key_fn(df):
        return df.select(F.md5("text").alias("__key"))

    watch = str(tmp_path / "in")
    store = str(tmp_path / "words")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)
    for i in range(3):
        sdir = str(tmp_path / f"stage_{i}")
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(sdir)
        dst = f"{watch}/arrival_{i:03d}.parquet"
        os.rename(glob.glob(f"{sdir}/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + i * 60,) * 2)
    # a duplicated arrival: the same batch-0 file delivered twice
    dup = f"{watch}/arrival_000_dup.parquet"
    shutil.copy(f"{watch}/arrival_000.parquet", dup)
    os.utime(dup, (1_700_000_000 + 200,) * 2)
    run_streaming_bloom(
        spark, watch, store, docs.schema, key_fn, m_bits=m_bits, k=4,
        checkpoint_dir=ckpt,
    )
    streamed = B.bloom_collect(bloom_words_from_store(spark, store), m_bits)
    assert streamed == one_shot
    # crash-replay of batch 1
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_streaming_bloom(
        spark, watch, store, docs.schema, key_fn, m_bits=m_bits, k=4,
        checkpoint_dir=ckpt,
    )
    assert (
        B.bloom_collect(bloom_words_from_store(spark, store), m_bits)
        == one_shot
    )
    docs.unpersist()


def test_streaming_cdc_store_duplicate_delivery(spark, tmp_path):
    """A COPIED arrival file is a new micro-batch, so its (doc, chunk)
    rows land again under a new batch id — what must hold is the
    content-addressed contract: the DIGEST SET is unchanged and the
    distinct (doc, chunk) view equals the one-shot batch chunking.
    (Same-batch-id crash replay is the case batch-keyed dynamic
    overwrite absorbs exactly.)"""
    import os

    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.dedup import cdc_chunks
    from pyspark_airflow_weather_etl_spark.streaming.cdc_store import (
        read_chunk_store,
        run_streaming_cdc_store,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} a b c d e f g tok{i}") for i in range(40)],
        "doc_id bigint, text string",
    )
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    for b in range(2):
        stage = str(tmp_path / f"s{b}")
        docs.where(F.col("doc_id") % 2 == b).coalesce(1).write.parquet(stage)
        import glob as g
        part = g.glob(f"{stage}/part-*.parquet")[0]
        os.rename(part, f"{watch}/b{b}.parquet")
    # duplicate delivery: batch 1's file arrives twice under a new name
    import shutil as sh
    sh.copy(f"{watch}/b1.parquet", f"{watch}/b1_dup.parquet")
    out = str(tmp_path / "chunks")
    run_streaming_cdc_store(
        spark, watch, out, docs.schema,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    store = read_chunk_store(spark, out)
    got = sorted(
        map(tuple, store
            .select("doc_id", "chunk_idx", "digest", "n_tokens")
            .dropDuplicates(["doc_id", "chunk_idx"]).collect())
    )
    want_rows = cdc_chunks(docs).collect()
    assert got == sorted(map(tuple, want_rows))
    # digest-level store content identical despite the duplicated file
    assert {r.digest for r in store.collect()} == {
        r.digest for r in want_rows
    }


def test_streaming_phrase_index_parity_and_replay(spark, tmp_path):
    """Streaming positional-index maintenance (streaming.phrase_index):
    (a) a phrase probe of the streamed index equals the ad-hoc
    phrase_counts on the full corpus (positions are per-document ⇒ any
    batch decomposition is probe-equivalent), and (b) a crash-replay
    (commit marker deleted, offsets kept) overwrites its own batch
    partitions instead of double-appending."""
    import glob
    import os

    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.retrieval import (
        phrase_counts,
        phrase_match_at_rest,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table
    from pyspark_airflow_weather_etl_spark.streaming.phrase_index import (
        run_streaming_phrase_index,
    )

    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    watch = str(tmp_path / "in")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)
    for slot, bucket in enumerate(range(3)):
        sdir = f"{watch}__stage_{bucket}"
        docs.where(F.col("doc_id") % 3 == bucket).coalesce(1).write.mode(
            "overwrite"
        ).parquet(sdir)
        part = glob.glob(f"{sdir}/part-*.parquet")[0]
        dst = f"{watch}/arrival_{slot:03d}.parquet"
        os.rename(part, dst)
        os.utime(dst, (1_700_000_000 + slot * 60,) * 2)
    run_streaming_phrase_index(
        spark, watch, index, docs.schema, checkpoint_dir=ckpt
    )
    phrases = [(1, "hash join"), (2, "table scan"), (3, "nope nope")]
    want = sorted(map(tuple, phrase_counts(docs, phrases).collect()))
    got = sorted(
        map(tuple, phrase_match_at_rest(spark, index, phrases).collect())
    )
    assert got == want
    # crash-replay: batch 1's output is on disk but the commit is gone
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_streaming_phrase_index(
        spark, watch, index, docs.schema, checkpoint_dir=ckpt
    )
    again = sorted(
        map(tuple, phrase_match_at_rest(spark, index, phrases).collect())
    )
    assert again == want
