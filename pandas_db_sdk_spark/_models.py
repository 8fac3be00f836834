"""Driver-side cache for trained model artifacts (centroids, codebooks).

ANN index construction is an INGEST-time step by contract: at 100 TB the
IVF cells and PQ codebooks are built once per corpus version and served to
every query; rebuilding them per query would be like re-sorting a table on
every ORDER BY. The corpus bindings and interactive re-runs hit the same
shape at sandbox scale — repeated invocations of d03g/d31 re-trained
k-means from scratch on identical input.

This pool memoizes the small driver-side artifacts (numpy arrays —
n_centroids × dim doubles, algorithm constants) keyed by the TRAINING
INPUT's analyzed-plan semantics plus the training parameters, with the
same two-gate identity check as the scratch-persist pool
(``_scratch.py``): the 32-bit ``semanticHash`` is the cheap first gate, a
full ``sameSemantics`` plan compare confirms, so a hash collision can
never serve a model trained on different data. One generation per slot:
changed input or parameters rebuilds and replaces (memory bounded);
identical re-invocation returns the cached artifact with zero Spark jobs.
"""

from __future__ import annotations

from typing import Any, Callable, Hashable

from pyspark.sql import DataFrame

_POOL: dict[tuple[str, str], tuple[int, DataFrame, Any]] = {}


def cached_model(
    df: DataFrame,
    slot: str,
    params: Hashable,
    builder: Callable[[], Any],
) -> Any:
    """Return the slot's cached artifact when it was built from a plan
    semantically identical to ``df`` with the same ``params``; otherwise
    call ``builder()``, cache, and return its result.

    ``df`` must be the training input actually consumed by ``builder`` —
    the cache key is its analyzed plan, so any change to the input
    (different table, filter, version) rebuilds.
    """
    key = (df.sparkSession.sparkContext.applicationId, f"{slot}/{params!r}")
    h = df._jdf.queryExecution().analyzed().semanticHash()
    old = _POOL.get(key)
    if old is not None and old[0] == h and df.sameSemantics(old[1]):
        return old[2]
    art = builder()
    _POOL[key] = (h, df, art)
    return art


def invalidate(spark, slot_prefix: str) -> None:
    """Drop every cached artifact whose slot starts with ``slot_prefix``
    for this application (tests / explicit retrain)."""
    app = spark.sparkContext.applicationId
    for key in [k for k in _POOL if k[0] == app and k[1].startswith(slot_prefix)]:
        _POOL.pop(key)
