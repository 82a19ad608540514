"""Batch-keyed raw-store sealing (sources.rawstore): the maintenance
pass that compacts per-micro-batch partitions into a versioned sealed
prefix WITHOUT breaking the writers' crash-replay idempotency.

Contract under test:
- content invariance: ``read_raw_store`` == plain live read, at every
  crash point of the seal pass and after any number of passes;
- file-count economics: sealing collapses per-batch files into
  ~one-per-bucket target-sized files;
- replay safety: a re-created live copy of a sealed batch (what a
  Structured Streaming crash-replay does) is ledger-excluded and later
  pruned — rows are seen exactly once throughout;
- ``keep_last`` protects the replayable tail (the max live batch id);
- a half-published version (no completeness marker) is invisible;
- end-to-end: the streaming SCD2 history and the streaming
  incremental-dedup pair stream are BYTE-IDENTICAL whether or not a
  seal pass ran mid-stream.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.sources import rawstore

from conftest import SF_DIR


def _write_batch(spark, live, bid, lo, hi, bucketed=True):
    df = spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 3).cast("int").alias("kb")
    )
    if not bucketed:
        df = df.drop("kb")
    spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", "dynamic"
    )
    cols = ["kb", "batch"] if bucketed else ["batch"]
    df.withColumn("batch", F.lit(bid)).write.mode("overwrite").partitionBy(
        *cols
    ).parquet(live)


def _snap(df):
    return sorted((r.id, r.batch) for r in df.collect())


def test_seal_content_invariance_and_compaction(spark, tmp_path):
    live = str(tmp_path / "store")
    for b in range(4):
        _write_batch(spark, live, b, b * 10, b * 10 + 10)
    before = _snap(spark.read.parquet(live))
    st = rawstore.seal_batches(spark, live, keep_last=1)
    assert st["sealed_now"] == [0, 1, 2]
    # batch 3 (the replayable tail) stays live
    assert sorted(
        int(p.split("batch=")[1].split("/")[0])
        for p in glob.glob(f"{live}/kb=*/batch=*")
    ) == [3, 3, 3]
    assert _snap(rawstore.read_raw_store(spark, live)) == before
    # compaction economics: one file per kb in the sealed snapshot
    assert st["sealed_data_files"] == 3
    assert st["live_files_after"] < st["live_files_before"]
    # sealed snapshot is hive-partitioned by kb → bucket-pruned reads
    sealed_glob = glob.glob(
        f"{rawstore.sealed_root(live)}/v-*/data/kb=*"
    )
    assert sealed_glob, "sealed data not partitioned by kb"


def test_replay_garbage_excluded_then_pruned(spark, tmp_path):
    live = str(tmp_path / "store")
    for b in range(3):
        _write_batch(spark, live, b, b * 10, b * 10 + 10)
    before = _snap(spark.read.parquet(live))
    rawstore.seal_batches(spark, live, keep_last=1)
    # crash-replay recreates sealed batch 1 with DIFFERENT rows: the
    # ledger must exclude the garbage copy (exactly-once view) ...
    _write_batch(spark, live, 1, 900, 905)
    assert _snap(rawstore.read_raw_store(spark, live)) == before
    # ... and the next pass prunes it from disk
    st = rawstore.seal_batches(spark, live, keep_last=1)
    assert st["garbage_pruned"] > 0
    assert not glob.glob(f"{live}/kb=*/batch=1")
    assert _snap(rawstore.read_raw_store(spark, live)) == before


def test_full_seal_and_empty_live(spark, tmp_path):
    live = str(tmp_path / "store")
    for b in range(2):
        _write_batch(spark, live, b, b * 10, b * 10 + 10)
    before = _snap(spark.read.parquet(live))
    st = rawstore.seal_batches(spark, live, keep_last=0)
    assert st["sealed_now"] == [0, 1] and st["live_files_after"] == 0
    assert _snap(rawstore.read_raw_store(spark, live)) == before
    # a second full seal is a no-op, not an error
    st2 = rawstore.seal_batches(spark, live, keep_last=0)
    assert st2["sealed_now"] == []
    assert _snap(rawstore.read_raw_store(spark, live)) == before


def test_flat_store_without_bucket_col(spark, tmp_path):
    live = str(tmp_path / "index")
    for b in range(3):
        _write_batch(spark, live, b, b * 10, b * 10 + 10, bucketed=False)
    before = _snap(spark.read.parquet(live))
    st = rawstore.seal_batches(spark, live, keep_last=1)
    assert st["sealed_now"] == [0, 1]
    assert _snap(rawstore.read_raw_store(spark, live)) == before
    # flat snapshot: no hive dirs under data
    assert not glob.glob(f"{rawstore.sealed_root(live)}/v-*/data/*=*")


def test_half_published_version_invisible(spark, tmp_path):
    live = str(tmp_path / "store")
    for b in range(2):
        _write_batch(spark, live, b, b * 10, b * 10 + 10)
    before = _snap(spark.read.parquet(live))
    # simulate a seal pass crashing mid-build: data written into the
    # next version dir but no completeness marker, no pointer flip
    vdir = f"{rawstore.sealed_root(live)}/v-000001"
    spark.read.parquet(live).where(F.col("batch") == 0).write.parquet(
        f"{vdir}/data"
    )
    os.remove(f"{vdir}/data/_SUCCESS")  # not even the sub-write committed
    assert _snap(rawstore.read_raw_store(spark, live)) == before
    # a later successful pass REUSES the crashed dir name (no complete
    # version exists, so v-000001 is still the next slot), overwrites
    # the partial contents, and converges
    st = rawstore.seal_batches(spark, live, keep_last=0)
    assert st["version"] == "v-000001"
    assert os.path.exists(f"{vdir}/_SUCCESS")
    assert _snap(rawstore.read_raw_store(spark, live)) == before


def test_streaming_scd2_equivalent_with_midstream_seal(spark, tmp_path):
    """The maintained SCD2 history is identical whether or not the raw
    store was sealed between micro-batch waves — and the post-seal
    refresh reads old batches from the compacted snapshot."""
    from pyspark_airflow_weather_etl_spark.operators.merge import (
        scd2_compact,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table
    from pyspark_airflow_weather_etl_spark.streaming.scd2 import (
        read_history,
        run_streaming_scd2,
    )

    ev = load_table(spark, SF_DIR, "events").limit(300).cache()
    watch = str(tmp_path / "in")
    raw = str(tmp_path / "raw")
    hist = str(tmp_path / "history")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    def stage(bucket, slot):
        sdir = str(tmp_path / f"stage_{slot}")
        ev.where(F.col("event_id") % 3 == bucket).coalesce(1).write.mode(
            "overwrite"
        ).parquet(sdir)
        part = glob.glob(f"{sdir}/part-*.parquet")[0]
        dst = f"{watch}/arrival_{slot:03d}.parquet"
        os.rename(part, dst)
        os.utime(dst, (1_700_000_000 + slot * 60,) * 2)

    def hsnap():
        return sorted(
            (r.user_id, r.event_type, r.valid_from_us, r.valid_to_us,
             r.version)
            for r in read_history(spark, hist).collect()
        )

    stage(0, 0)
    stage(1, 1)
    run_streaming_scd2(
        spark, watch, raw, hist, ev.schema, checkpoint_dir=ckpt
    )
    st = rawstore.seal_batches(spark, raw, keep_last=1)
    assert st["sealed_now"], "nothing sealed mid-stream"
    # the raw-store view is still the full event set seen so far
    seen = ev.where(F.col("event_id") % 3 != 2)
    raw_ids = sorted(
        r.event_id
        for r in rawstore.read_raw_store(spark, raw).collect()
    )
    assert raw_ids == sorted(r.event_id for r in seen.collect())
    stage(2, 2)
    run_streaming_scd2(
        spark, watch, raw, hist, ev.schema, checkpoint_dir=ckpt
    )
    want = sorted(
        (r.user_id, r.event_type, r.valid_from_us, r.valid_to_us,
         r.version)
        for r in scd2_compact(
            ev, "user_id", "event_type", "ts", "event_id"
        ).collect()
    )
    assert hsnap() == want
    ev.unpersist()


def test_streaming_incremental_dedup_with_midstream_seal(spark, tmp_path):
    """Sealing the signature index between batch waves changes its
    LAYOUT only: the emitted pair stream still equals the unsealed
    run's (which the catalog entry hash-checks against the one-shot
    batch oracle)."""
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table
    from pyspark_airflow_weather_etl_spark.streaming.incremental_dedup import (
        read_emitted_pairs,
        run_streaming_incremental_dedup,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(120).cache()

    def run(root, seal_between):
        watch = f"{root}/in"
        os.makedirs(watch)
        for wave, buckets in enumerate([(0, 1), (2, 3)]):
            for slot, b in enumerate(buckets, start=wave * 2):
                sdir = f"{root}/stage_{slot}"
                docs.where(F.col("doc_id") % 4 == b).coalesce(
                    1
                ).write.parquet(sdir)
                part = glob.glob(f"{sdir}/part-*.parquet")[0]
                dst = f"{watch}/batch_{slot:03d}.parquet"
                os.rename(part, dst)
                os.utime(dst, (1_700_000_000 + slot * 60,) * 2)
            run_streaming_incremental_dedup(
                spark,
                watch,
                f"{root}/index",
                f"{root}/pairs",
                docs.schema,
                checkpoint_dir=f"{root}/ckpt",
                threshold=0.5,
            )
            if seal_between and wave == 0:
                st = rawstore.seal_batches(
                    spark, f"{root}/index", keep_last=1
                )
                assert st["sealed_now"], "nothing sealed"
        return sorted(
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in read_emitted_pairs(
                spark, f"{root}/pairs"
            ).collect()
        )

    plain = run(str(tmp_path / "plain"), seal_between=False)
    sealed = run(str(tmp_path / "sealed"), seal_between=True)
    assert sealed == plain and plain
    docs.unpersist()


def test_keep_last_protects_uncommitted_tail(spark, tmp_path):
    live = str(tmp_path / "store")
    _write_batch(spark, live, 0, 0, 10)
    _write_batch(spark, live, 1, 10, 20)
    st = rawstore.seal_batches(spark, live, keep_last=2)
    assert st["sealed_now"] == []
    st = rawstore.seal_batches(spark, live, keep_last=1)
    assert st["sealed_now"] == [0]


def test_streaming_semantic_dedup_with_midstream_seal(spark, tmp_path):
    """Sealing the semantic index's rows tree (bucket column
    ivf_cell) between batch waves is layout-only: the surviving
    corpus equals the unsealed run's."""
    from pyspark_airflow_weather_etl_spark.operators import (
        similarity as S,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table
    from pyspark_airflow_weather_etl_spark.streaming.semantic_dedup import (
        read_kept,
        run_streaming_semantic_dedup,
    )

    emb = load_table(spark, SF_DIR, "embeddings").limit(200).cache()

    def run(root, seal_between):
        watch = f"{root}/in"
        os.makedirs(watch)
        S.semantic_centroids_write_fixed(emb, f"{root}/idx", n_centroids=8)
        for wave, buckets in enumerate([(0, 1), (2, 3)]):
            for slot, b in enumerate(buckets, start=wave * 2):
                sdir = f"{root}/stage_{slot}"
                emb.where(F.col("vec_id") % 4 == b).coalesce(
                    1
                ).write.parquet(sdir)
                part = glob.glob(f"{sdir}/part-*.parquet")[0]
                dst = f"{watch}/batch_{slot:03d}.parquet"
                os.rename(part, dst)
                os.utime(dst, (1_700_000_000 + slot * 60,) * 2)
            run_streaming_semantic_dedup(
                spark,
                watch,
                f"{root}/idx",
                f"{root}/drops",
                emb.schema,
                checkpoint_dir=f"{root}/ckpt",
                threshold=0.4,
            )
            if seal_between and wave == 0:
                st = rawstore.seal_batches(
                    spark, f"{root}/idx/rows", keep_last=1,
                    bucket_col="ivf_cell",
                )
                assert st["sealed_now"], "nothing sealed"
        return sorted(
            (r.vec_id, r.ivf_cell)
            for r in read_kept(
                spark, f"{root}/idx", f"{root}/drops"
            ).collect()
        )

    plain = run(str(tmp_path / "plain"), seal_between=False)
    sealed = run(str(tmp_path / "sealed"), seal_between=True)
    assert sealed == plain and plain
    emb.unpersist()


def test_repeated_seal_cycles_with_growth(spark, tmp_path):
    """The steady-state maintenance loop: write → seal → write → seal
    …; every cycle folds the previous cycle's batches into the next
    sealed version, content stays exactly-once throughout, and
    version pruning keeps at most current + previous on disk."""
    live = str(tmp_path / "store")
    expected = []
    bid = 0
    for cycle in range(3):
        for _ in range(2):
            _write_batch(spark, live, bid, bid * 10, bid * 10 + 10)
            expected += [(i, bid) for i in range(bid * 10, bid * 10 + 10)]
            bid += 1
        st = rawstore.seal_batches(spark, live, keep_last=1)
        assert _snap(rawstore.read_raw_store(spark, live)) == sorted(
            expected
        )
        if cycle > 0:
            assert st["sealed_now"], f"cycle {cycle} sealed nothing"
    versions = glob.glob(f"{rawstore.sealed_root(live)}/v-*")
    assert len(versions) <= 2, versions
    # the ledger names every batch except the protected tail
    ledger, vname = rawstore._read_ledger(
        spark, rawstore.sealed_root(live)
    )
    assert ledger == set(range(bid - 1))


def test_list_live_skips_hidden_path_segments(spark, tmp_path):
    """In-flight concurrent writes leave _temporary/.spark-staging
    trees; their bytes must not count as live and their batch ids must
    never be listed (a seal pass overlapping a trigger would otherwise
    seal a half-written batch)."""
    live = str(tmp_path / "store")
    _write_batch(spark, live, 0, 0, 10)
    _write_batch(spark, live, 1, 10, 20)
    # staging debris BELOW a batch dir
    os.makedirs(f"{live}/kb=0/batch=99/_temporary/0", exist_ok=True)
    with open(
        f"{live}/kb=0/batch=99/_temporary/0/part-0.parquet", "wb"
    ) as f:
        f.write(b"x" * 4096)
    # staging debris ABOVE the hive dirs
    os.makedirs(f"{live}/.spark-staging-xyz/kb=1/batch=77", exist_ok=True)
    with open(
        f"{live}/.spark-staging-xyz/kb=1/batch=77/part-0.parquet", "wb"
    ) as f:
        f.write(b"y" * 4096)
    per_batch, per_prefix = rawstore._list_live(spark, live)
    assert set(per_batch) == {0, 1}
    assert all(bid in (0, 1) for (_, bid) in per_prefix)
    # and a seal pass over this tree never touches the phantom ids
    st = rawstore.seal_batches(spark, live, keep_last=1)
    assert st["sealed_now"] == [0]


def test_seal_sizing_ignores_protected_batches(spark, tmp_path):
    """Output-slot sizing must count ONLY the batches being sealed:
    a huge keep_last-protected tail batch with a tiny sealable head
    still compacts to ~one file per bucket."""
    live = str(tmp_path / "store")
    _write_batch(spark, live, 0, 0, 30)  # tiny, sealable
    # huge protected tail: would force many slots if (wrongly) counted
    df = spark.range(0, 200_000).select(
        F.col("id"),
        (F.col("id") % 3).cast("int").alias("kb"),
    )
    spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", "dynamic"
    )
    df.withColumn("batch", F.lit(1)).write.mode("overwrite").partitionBy(
        "kb", "batch"
    ).parquet(live)
    st = rawstore.seal_batches(
        spark, live, keep_last=1, target_file_bytes=8 * 1024
    )
    assert st["sealed_now"] == [0]
    # 3 buckets of ~10 tiny rows each -> one file per bucket
    assert st["sealed_data_files"] <= 3, st
