"""Cache-handle plumbing for operators that persist() intermediate frames.

Several operators (minhash_dedup, ngram_jaccard_dedup, clean_corpus,
evaluate_ner_suite) persist a branch-point DataFrame so the physical plan
scans/tokenizes the corpus exactly once. The persist must outlive the
function (the returned DataFrame is lazy — the cache is hit when the
CALLER runs an action), so the operator cannot unpersist before
returning. Left unreleased in a long-lived session these cached raw-scan
projections accumulate, and Spark's CacheManager can substitute the
InMemoryRelation into unrelated identical subplans (the hazard class
commit 088c765 worked around in tests).

Contract: operators attach their persisted handles to the OUTPUT
DataFrame with attach_caches(); callers release them after the consuming
action with release_caches(). Handles propagate through composition
(clean_corpus forwards minhash_dedup's handles), so one release at the
top of a chain frees every cache beneath it. Releasing is idempotent and
optional — skipping it merely keeps the cache alive until session end,
exactly the pre-round-4 behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_gs_caches"


def attach_caches(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Attach persisted `cached` frames (and any handles already riding on
    them) to `out` so the caller can release them after its action."""
    handles = list(getattr(out, _ATTR, []))
    for c in cached:
        handles.extend(getattr(c, _ATTR, []))
        handles.append(c)
    setattr(out, _ATTR, handles)
    return out


def forward_caches(out: DataFrame, *inputs: DataFrame) -> DataFrame:
    """Copy the cache handles riding on `inputs` onto `out` WITHOUT adding
    the inputs themselves as handles (they may be ordinary lazy frames).

    Handles ride as a Python attribute on one specific DataFrame object,
    so any transformation (.filter/.select returns a new object) silently
    drops them (ADVICE r4). Composing operators (pagerank,
    entity_components, two_hop_paths, ...) call this on their output so a
    cached upstream (e.g. canonicalize's persisted surfaces under
    q_kg_triples) stays releasable through the composition."""
    handles = list(getattr(out, _ATTR, []))
    for src in inputs:
        handles.extend(getattr(src, _ATTR, []))
    if handles:
        setattr(out, _ATTR, handles)
    return out


def release_caches(df: DataFrame) -> int:
    """Unpersist every cache handle attached to `df`; returns the number
    released. Safe to call on any DataFrame (no-op without handles) and
    safe to call twice (the handle list is cleared)."""
    handles = getattr(df, _ATTR, [])
    for c in handles:
        try:
            c.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    if handles:
        setattr(df, _ATTR, [])
    return len(handles)
