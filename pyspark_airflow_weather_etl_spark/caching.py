"""Deterministic ownership for operator-internal ``persist()`` caches.

Several operators (inverted-index Jaccard, MinHash-LSH, SRP blocking)
persist an intermediate because their self-joins would otherwise
re-run the expensive kernel once per join side — Spark does no
cross-consumer common-subexpression reuse. Those operators return
LAZY DataFrames, so they cannot unpersist before the caller consumes
the result; left untracked, the blocks lived until session end and
long sessions (the bench loop, the correctness driver's 108-query
sweep) accumulated executor-storage pressure.

Ownership contract:

- Each operator claims a named *cache group* on entry
  (``claim_group``). Claiming releases the PREVIOUS invocation's
  blocks, so a session holds at most one invocation's cache per
  operator — bounded, regardless of how many queries run.
- A caller that wants the blocks gone immediately after consuming a
  result calls ``release_cached()`` (everything) or
  ``release_cached(group)``. ``bench.py`` does this between queries
  instead of the old blanket ``catalog.clearCache()``.
- Consuming a result AFTER its group was re-claimed or released is
  still CORRECT — lineage is retained, Spark just recomputes — it
  only forfeits the cache.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_lock = threading.Lock()
_groups: dict[str, list[DataFrame]] = {}


def claim_group(name: str) -> list[DataFrame]:
    """Start a new cache generation for operator ``name``: release the
    previous invocation's tracked frames and return a fresh list to
    register this invocation's persisted frames into."""
    with _lock:
        prev = _groups.pop(name, [])
        frames: list[DataFrame] = []
        _groups[name] = frames
    _unpersist_all(prev)
    return frames


def persist_into(frames: list[DataFrame], df: DataFrame) -> DataFrame:
    """``df.persist()`` registered for group-scoped release.

    If ``frames`` is no longer the registered list for any group — a
    concurrent invocation re-claimed the group (or ``release_cached``
    ran) while this invocation was still building — the block is
    unpersisted immediately instead of being appended to the orphaned
    list, where nothing would ever release it. The caller's result
    stays correct (lineage is retained); it only forfeits the cache,
    which is the documented late-consumer semantics anyway. The check
    and append share the claim lock, so an append can never land in a
    list that ``claim_group`` has already popped for release.
    """
    df.persist()
    with _lock:
        if any(frames is live for live in _groups.values()):
            frames.append(df)
            return df
    try:
        df.unpersist(blocking=False)
    except Exception:
        pass  # session already stopped — nothing to release
    return df


def release_cached(name: str | None = None) -> None:
    """Unpersist every tracked cache (or just group ``name``'s).
    Blocking, so storage is actually free when this returns — the
    property the repeated-call tests assert."""
    with _lock:
        if name is None:
            doomed = [df for frames in _groups.values() for df in frames]
            _groups.clear()
        else:
            doomed = _groups.pop(name, [])
    _unpersist_all(doomed)


def _unpersist_all(frames: list[DataFrame]) -> None:
    for df in frames:
        try:
            df.unpersist(blocking=True)
        except Exception:
            pass  # session already stopped — nothing to release
