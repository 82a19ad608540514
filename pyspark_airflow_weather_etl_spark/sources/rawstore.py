"""Batch-keyed raw-store maintenance — sealing old micro-batch
partitions into a compacted prefix without breaking replay idempotency.

The streaming writers in this engine (``streaming/scd2.py`` raw events,
``streaming/incremental_dedup.py`` signature index,
``streaming/encode.py`` encodings) all use the same durable idiom:
each micro-batch lands under ``<root>/.../batch=<id>`` with dynamic
partition overwrite, so a crash-replayed batch OVERWRITES its own
partition instead of double-appending. That idiom accretes one
directory (and ≥1 file) per batch forever — at streaming cadence a
month of 30 s triggers is ~86 k directories, and every downstream read
pays listing + footer-parse per file. A drop-in ``compact_table`` call
is NOT safe here (checked round 9): folding ``batch=`` away in place
leaves mixed partition depths under the store root (discovery error)
and breaks the replay contract — a replayed batch would re-create its
``batch=`` dir next to data that already contains its rows, silently
double-counting.

The coherent design (this module): the live zone keeps the writer's
layout untouched, and a maintenance pass SEALS old batches into a
separate compacted prefix that readers union:

- ``<root>/...`` — the live zone. Writers never change.
- ``<root>_sealed/v-<n>/data/...`` — compacted snapshot (few
  target-sized files, hive-partitioned by the store's bucket column
  when present so bucket-pruned reads stay pruned; ``batch`` is kept
  as a DATA column for provenance and replay exclusion).
- ``<root>_sealed/v-<n>/ledger/`` — the idempotency ledger: the set of
  batch ids whose rows live in the sealed snapshot.
- ``<root>_sealed/_current`` — the versioned-pointer protocol of
  ``writers.publish_version`` (data dirs never mutated while live).

Readers (:func:`read_raw_store`) see ``sealed ∪ (live ∖ ledger)``:
exactly-once rows at every crash point. If a crash-replay re-creates a
batch dir that was already sealed, the ledger excludes the garbage
copy and the next seal pass deletes it — the replay contract survives
sealing. ``keep_last`` (default 1) additionally protects the highest
live batch ids from sealing, because the only batch a Structured
Streaming restart can replay is the last uncommitted one (the max id
present); with ``keep_last >= 1`` sealing is safe to run while the
stream is merely paused between triggers. ``keep_last=0`` is the
quiesced full-seal (stream stopped).

Crash points of the seal pass itself: before publish — pointer names
the old version, live untouched; after publish, before live-dir
deletion — the new ledger already excludes the sealed ids from the
live read, and the deletion is retried (idempotently) at the start of
the next pass. At no instant can a reader see a row zero or two times.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .writers import (
    _hadoop_fs,
    publish_version,
    resolve_serving_version,
)

LEDGER_SCHEMA = "batch bigint"


def sealed_root(live_path: str) -> str:
    return live_path.rstrip("/") + "_sealed"


def _list_live(spark: SparkSession, live_path: str):
    """One recursive listing of the live zone → per-batch-id stats:
    ``{batch_id: (bytes, n_files)}`` plus per-(hive-prefix-above-
    ``batch=``, batch_id) byte totals (used to size the compacted
    rewrite without reading data — keyed by batch so the seal pass can
    count ONLY the batches actually being sealed)."""
    jvm, fs, root = _hadoop_fs(spark, live_path.rstrip("/"))
    per_batch: dict[int, list[int]] = {}
    per_prefix: dict[tuple[str, int], int] = {}
    if not fs.exists(root):
        return per_batch, per_prefix
    base_uri = fs.makeQualified(root).toString().rstrip("/")
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        fp = st.getPath()
        rel = fp.toString()[len(base_uri):].strip("/").split("/")
        # hidden ANY-segment (not just leaf): files under _temporary /
        # .spark-staging from an in-flight concurrent write must never
        # count as live bytes or surface their batch ids to a seal
        if any(seg.startswith(("_", ".")) for seg in rel):
            continue
        batch_id = None
        prefix_segs: list[str] = []
        for seg in rel[:-1]:
            if seg.startswith("batch="):
                try:
                    batch_id = int(seg[len("batch="):])
                except ValueError:
                    batch_id = None
                break
            prefix_segs.append(seg)
        if batch_id is None:
            continue
        b = per_batch.setdefault(batch_id, [0, 0])
        b[0] += st.getLen()
        b[1] += 1
        key = ("/".join(prefix_segs), batch_id)
        per_prefix[key] = per_prefix.get(key, 0) + st.getLen()
    return per_batch, per_prefix


def _read_ledger(
    spark: SparkSession, sealed_path: str
) -> tuple[set[int], str | None]:
    """(sealed batch ids, live version dir name) — empty set / None
    when no complete sealed version exists."""
    vname = resolve_serving_version(spark, sealed_path)
    if vname is None:
        return set(), None
    rows = spark.read.schema(LEDGER_SCHEMA).parquet(
        f"{sealed_path.rstrip('/')}/{vname}/ledger"
    ).collect()
    return {int(r.batch) for r in rows}, vname


def _delete_live_batches(spark, live_path: str, ids: set[int]) -> int:
    """Delete every ``batch=<id>`` directory under the live zone for
    ids in ``ids`` (idempotent — sealed ids can be pruned at any time,
    including replay-garbage re-creations). Returns dirs deleted."""
    if not ids:
        return 0
    jvm, fs, root = _hadoop_fs(spark, live_path.rstrip("/"))
    if not fs.exists(root):
        return 0
    deleted = 0
    # batch= dirs sit either directly under the root (flat stores:
    # the dedup index) or one bucket level down (kb=<b>/batch=<id>).
    stack = [root]
    while stack:
        d = stack.pop()
        for st in fs.listStatus(d):
            if not st.isDirectory():
                continue
            name = st.getPath().getName()
            if name.startswith("batch="):
                try:
                    bid = int(name[len("batch="):])
                except ValueError:
                    continue
                if bid in ids:
                    fs.delete(st.getPath(), True)
                    deleted += 1
            elif "=" in name:
                stack.append(st.getPath())
    return deleted


def seal_batches(
    spark: SparkSession,
    live_path: str,
    sealed_path: str | None = None,
    keep_last: int = 1,
    target_file_bytes: int = 128 * 1024 * 1024,
    bucket_col: str | None = "kb",
) -> dict:
    """Seal every live batch except the ``keep_last`` highest ids into
    the compacted prefix; returns a stats dict. Safe to re-run at any
    cadence; a pass with nothing to seal still prunes replay garbage
    (live copies of already-sealed ids).

    The compacted snapshot is sized from the LISTING (no data read):
    ``ceil(bytes/target)`` output slots per bucket value when
    ``bucket_col`` partitions the store (a salted repartition bounded
    per bucket — one hot bucket splits into target-sized files, small
    buckets keep one file, same recipe as ``operators.scale.
    compact_table``), a flat ``repartition(n)`` otherwise."""
    sealed = sealed_path or sealed_root(live_path)
    ledger, vname = _read_ledger(spark, sealed)
    # retry any crashed/garbage deletions first, then re-list
    pruned = _delete_live_batches(spark, live_path, ledger)
    per_batch, per_prefix = _list_live(spark, live_path)
    present = sorted(per_batch)
    protected = set(present[len(present) - keep_last:]) if keep_last else set()
    to_seal = [b for b in present if b not in protected]
    stats = {
        "sealed_now": to_seal,
        "ledger_before": len(ledger),
        "garbage_pruned": pruned,
        "live_files_before": sum(v[1] for v in per_batch.values()),
    }
    if not to_seal:
        stats["version"] = vname
        return stats

    seal_set = set(to_seal)
    live = spark.read.parquet(live_path.rstrip("/"))
    newly = live.where(F.col("batch").isin([int(b) for b in to_seal]))
    base = sealed.rstrip("/")
    old = (
        spark.read.parquet(f"{base}/{vname}/data") if vname else None
    )
    snapshot = old.unionByName(newly) if old is not None else newly

    # ---- size the rewrite from listings (old sealed tree + the live
    # bytes of the batches being sealed) ----
    jvm, fs, root = _hadoop_fs(spark, base)
    use_bucket = bucket_col is not None and bucket_col in snapshot.columns
    if use_bucket:
        pv_bytes: dict[str, int] = {}
        # live side: per_prefix is keyed (hive prefix above batch=,
        # batch id) — only batches being sealed contribute, so
        # keep_last-protected batches never inflate the slot counts
        for (prefix, bid), nbytes in per_prefix.items():
            if bid not in seal_set:
                continue
            if not prefix.startswith(f"{bucket_col}="):
                continue
            val = prefix.split("=", 1)[1]
            pv_bytes[val] = pv_bytes.get(val, 0) + nbytes
        if vname and fs.exists(
            jvm.org.apache.hadoop.fs.Path(root, f"{vname}/data")
        ):
            it = fs.listFiles(
                jvm.org.apache.hadoop.fs.Path(root, f"{vname}/data"), True
            )
            data_uri = fs.makeQualified(
                jvm.org.apache.hadoop.fs.Path(root, f"{vname}/data")
            ).toString().rstrip("/")
            while it.hasNext():
                st = it.next()
                fp = st.getPath()
                rel = fp.toString()[len(data_uri):].strip("/").split("/")
                if any(seg.startswith(("_", ".")) for seg in rel):
                    continue
                for seg in rel[:-1]:
                    if seg.startswith(f"{bucket_col}="):
                        val = seg.split("=", 1)[1]
                        pv_bytes[val] = pv_bytes.get(val, 0) + st.getLen()
                        break
        slot_rows = [
            (val, max(1, math.ceil(b / target_file_bytes)))
            for val, b in sorted(pv_bytes.items())
        ]
        data_cols = [c for c in snapshot.columns]
        if slot_rows:
            slots_df = spark.createDataFrame(
                slot_rows, schema="__pv string, __slots int"
            )
            salted = snapshot.join(
                F.broadcast(slots_df),
                F.col(bucket_col).cast("string").eqNullSafe(F.col("__pv")),
                "left",
            ).withColumn(
                "__salt",
                F.pmod(
                    F.xxhash64(*[F.col(c) for c in data_cols]),
                    F.coalesce(F.col("__slots"), F.lit(1)),
                ).cast("int"),
            )
            n_slots = max(1, sum(r[1] for r in slot_rows))
            snapshot = salted.repartition(
                n_slots, F.col(bucket_col), F.col("__salt")
            ).drop("__salt", "__slots", "__pv")
    else:
        total = sum(per_batch[b][0] for b in to_seal)
        snapshot = snapshot.repartition(
            max(1, math.ceil(total / target_file_bytes))
        )

    all_sealed = sorted(ledger | seal_set)
    ledger_df = spark.createDataFrame(
        [(int(b),) for b in all_sealed], schema=LEDGER_SCHEMA
    )

    def build(vdir: str) -> None:
        w = snapshot.write.mode("overwrite")
        if use_bucket:
            w = w.partitionBy(bucket_col)
        w.parquet(f"{vdir}/data")
        ledger_df.coalesce(1).write.mode("overwrite").parquet(
            f"{vdir}/ledger"
        )

    new_v = publish_version(spark, sealed, build)
    # only after the publish commits: drop the sealed ids' live dirs
    _delete_live_batches(spark, live_path, seal_set)
    after_batch, _ = _list_live(spark, live_path)
    _, sealed_files = _count_tree(spark, f"{base}/{new_v}/data")
    stats.update(
        version=new_v,
        ledger_after=len(all_sealed),
        live_files_after=sum(v[1] for v in after_batch.values()),
        sealed_data_files=sealed_files,
    )
    return stats


def _count_tree(spark, path: str) -> tuple[int, int]:
    jvm, fs, root = _hadoop_fs(spark, path)
    if not fs.exists(root):
        return 0, 0
    total = files = 0
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().startswith(("_", ".")):
            continue
        total += st.getLen()
        files += 1
    return total, files


def read_raw_store(
    spark: SparkSession,
    live_path: str,
    sealed_path: str | None = None,
) -> DataFrame:
    """Exactly-once view of a batch-keyed raw store:
    ``sealed snapshot ∪ (live batches ∖ ledger)``. Columns match the
    plain live read (``batch`` present; bucket column present when the
    writer buckets), so existing consumers swap their
    ``spark.read.parquet(live)`` for this call and nothing else
    changes. Bucket- and batch-predicates prune on BOTH sides (the
    sealed snapshot is hive-partitioned by the bucket column; live
    keeps the writer's layout)."""
    sealed = sealed_path or sealed_root(live_path)
    ledger, vname = _read_ledger(spark, sealed)
    per_batch, _ = _list_live(spark, live_path)
    keep = sorted(set(per_batch) - ledger)
    live = None
    if keep:
        live = spark.read.parquet(live_path.rstrip("/")).where(
            F.col("batch").isin([int(b) for b in keep])
        )
    if vname is None:
        if live is None:
            # not a batch-keyed store (no batch=<id> dirs) and nothing
            # sealed: behave exactly like the plain read the caller
            # would otherwise do — non-batch-keyed layouts (e.g. a
            # one-shot index write) stay readable through this API,
            # and a truly empty tree surfaces Spark's own error
            return spark.read.parquet(live_path.rstrip("/"))
        return live
    sealed_df = spark.read.parquet(
        f"{sealed.rstrip('/')}/{vname}/data"
    )
    if live is None:
        return sealed_df
    return sealed_df.unionByName(live.select(*sealed_df.columns))
