"""Single-slot persist registry: bounded caching for operator
intermediates that are rebuilt on every call.

Operators like ``retrieval.tfidf_weights`` and ``dedup.substring_dedup``
persist() corpus-derived intermediates so one action doesn't tokenize
the corpus N times (shared lineage is not shared execution). persist()
is the right barrier there — lazy, so plan-only consumers (.explain,
tools/plan_audit.py) never execute jobs, and LRU-evictable — but cached
entries live in the JVM CacheManager until explicitly unpersisted:
Python GC of the DataFrame wrapper does NOT release them, so a
long-lived session calling the operator against a rolling series of
corpora accumulates dead cached plans (the r7 verdict's watch item).

``slot_persist`` bounds that to ONE live generation per named slot —
the `_INDEX_CACHE` discipline applied to cached frames: when a slot is
asked to persist frames for a DIFFERENT input plan, the previous
generation is unpersisted (non-blocking) first. Re-calling an operator
on the SAME input reuses the already-persisted frames, so repeated
calls cost one cache fill, and alternating inputs can never hold more
than one generation of blocks per slot.

Plan identity uses Catalyst's ``sameResult`` on the analyzed plans
(exact — a semanticHash collision could silently serve another
corpus's cache).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

# slot name -> (key DataFrame, tuple of persisted DataFrames)
_SLOTS: dict[str, tuple[DataFrame, tuple[DataFrame, ...]]] = {}
# Spark apps legitimately submit queries from multiple driver threads;
# an unlocked check-then-set would let two threads persist two
# generations and strand one in the CacheManager forever — the exact
# leak this module exists to bound.
_LOCK = threading.Lock()


def _same_plan(a: DataFrame, b: DataFrame) -> bool:
    try:
        return bool(
            a._jdf.queryExecution()
            .analyzed()
            .sameResult(b._jdf.queryExecution().analyzed())
        )
    except Exception:
        # defensive: a dead session in the stored slot (e.g. tests
        # recycling SparkSessions) must roll the slot, not crash the
        # operator
        return False


def slot_persist(
    slot: str, key: DataFrame, frames: tuple[DataFrame, ...]
) -> tuple[DataFrame, ...]:
    """Persist ``frames`` under ``slot``, releasing the previous
    generation if ``key``'s plan differs from the stored one.

    ``key`` identifies the input (pass the frame whose plan determines
    every member of ``frames`` — same key plan implies same frames).
    Returns the slot's live frames: the STORED ones on a key match
    (already persisted, possibly already materialized), the freshly
    persisted ``frames`` otherwise.
    """
    with _LOCK:
        held = _SLOTS.get(slot)
        if held is not None and _same_plan(held[0], key):
            return held[1]
        if held is not None:
            for f in held[1]:
                try:
                    f.unpersist(blocking=False)
                except Exception:
                    pass  # session gone — nothing to release
        frames = tuple(f.persist() for f in frames)
        _SLOTS[slot] = (key, frames)
        return frames


def slot_release(slot: str) -> None:
    """Explicitly release a slot's cached generation (tests, teardown)."""
    with _LOCK:
        held = _SLOTS.pop(slot, None)
    if held is not None:
        for f in held[1]:
            try:
                f.unpersist(blocking=False)
            except Exception:
                pass
