"""Operator-scoped scratch-persist pool (one cached generation per slot).

Several operators persist() mid-pipeline intermediates that feed multiple
plan branches (MinHash signatures, the TF table).  Two failure modes to
avoid:

* **Unbounded accumulation.**  Spark frees cached blocks only on explicit
  unpersist(), but an operator cannot unpersist before returning — the
  frames it returns are lazy and still depend on those blocks.  Repeated
  invocations with CHANGING inputs/parameters would pile up dead cached
  generations in executor storage memory.
* **Losing warm-path reuse.**  Spark's CacheManager matches persisted
  plans semantically: re-invoking an operator with IDENTICAL input and
  parameters rebuilds the same logical plan, and its persist() resolves
  to the already-cached relation — repeated runs (a benchmark's warm
  reps, an interactive re-run) skip the corpus pass entirely.  An
  unconditional unpersist-previous-generation policy would destroy that.

The pool does both: each persist site registers under a ``slot`` name;
a new frame whose analyzed plan semantically matches the slot's current
occupant reuses it (no new blocks, warm path intact); a mismatch evicts
the old generation first (memory bounded at one generation per slot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_POOL: dict[tuple[str, str], tuple[int, DataFrame]] = {}


def scratch_persist(
    df: DataFrame,
    slot: str,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """persist() with slot semantics: reuse the slot's cached frame when
    the plan is semantically identical, evict it when not."""
    key = (df.sparkSession.sparkContext.applicationId, slot)
    h = df._jdf.queryExecution().analyzed().semanticHash()
    old = _POOL.get(key)
    if old is not None:
        # semanticHash is 32-bit — a collision would hand back a cached
        # frame for DIFFERENT input (silently wrong results, not a perf
        # hiccup). The hash is the cheap first gate; sameSemantics (a full
        # canonicalized-plan compare, driver-side only) confirms.
        if old[0] == h and df.sameSemantics(old[1]):
            # same plan → the CacheManager would resolve to the same
            # relation anyway; hand back the live cached handle. If an
            # external clearCache() dropped its blocks (storageLevel
            # resets to NONE), re-register the persist first — otherwise
            # every consumer silently recomputes the scratch forever.
            if not old[1].storageLevel.useMemory and not old[1].storageLevel.useDisk:
                old[1].persist(level)
            return old[1]
        try:
            old[1].unpersist(False)
        except Exception:
            pass  # session torn down — blocks are gone anyway
    df = df.persist(level)
    _POOL[key] = (h, df)
    return df


def reclaim(spark, slot_prefix: str) -> None:
    """Explicitly drop every pool slot starting with ``slot_prefix`` for
    this application (tests / manual memory management)."""
    app = spark.sparkContext.applicationId
    for key in [k for k in _POOL if k[0] == app and k[1].startswith(slot_prefix)]:
        _, df = _POOL.pop(key)
        try:
            df.unpersist(False)
        except Exception:
            pass
