"""Round-state materialization for iterative DataFrame loops.

Every iterative operator in this engine (connected components, BPE /
unigram training, the curation barrier) must cut lineage each round —
otherwise round N+1's plan embeds rounds 1..N and the analyzer cost
grows without bound (the classic iterative-algorithm footgun, measured
as a 6 GB driver OOM on a 122-row corpus in
:mod:`..operators.curation`).

Two ways to cut it, with DIFFERENT failure semantics:

- ``localCheckpoint()`` (the default): round blocks live in executor
  storage. Fastest — no filesystem round trip — but the blocks are
  EXECUTOR-PINNED: lineage was truncated, so losing one executor
  mid-loop fails the whole job with no recompute path. Correct on
  local[*] and acceptable on clusters where a retry-from-scratch is
  cheaper than checkpoint I/O.
- ``checkpoint()`` with a reliable ``checkpoint_dir`` (HDFS /
  object store / any fault-tolerant path): round blocks are WRITTEN
  OUT, so an executor loss re-reads them from storage and the loop
  survives — the 100 TB-safe mode for multi-hour trainings
  (a 32k-merge BPE run should not restart because one of 1000
  executors was preempted).

Checkpoint files accumulate one directory per materialized round;
Spark garbage-collects them when
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (the
engine's sessions leave it default-off, so callers either set it or
clean ``checkpoint_dir`` after the loop — the trade is documented
rather than hidden because auto-cleaning also deletes checkpoints a
crashed driver might want for forensics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def round_checkpoint(
    df: DataFrame,
    checkpoint_dir: str | None = None,
    eager: bool = True,
) -> DataFrame:
    """Materialize one round's state and truncate its lineage.

    ``checkpoint_dir=None`` → ``localCheckpoint(eager)`` (fast,
    executor-pinned). A string → reliable ``checkpoint(eager)`` into
    that directory (executor-loss safe); the SparkContext checkpoint
    dir is set on first use and left alone if already pointing inside
    ``checkpoint_dir`` (Spark appends a per-context UUID subdir, so
    prefix-matching is the correct identity test). Spark reports the
    current dir as a FileSystem-qualified URI (``file:/tmp/ckpt/...``
    for a plain local path), so the caller's path is qualified the
    same way before the prefix test — comparing raw strings would
    re-set the dir every round and leak one UUID subdir per
    checkpoint (ADVICE round 13).
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    opt = sc._jsc.sc().getCheckpointDir()
    cur = opt.get() if opt.isDefined() else None
    jvm = sc._jvm
    want = jvm.org.apache.hadoop.fs.Path(checkpoint_dir)
    fs = want.getFileSystem(sc._jsc.hadoopConfiguration())
    qualified = fs.makeQualified(want).toString()
    if cur is None or not cur.startswith(qualified):
        sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=eager)
