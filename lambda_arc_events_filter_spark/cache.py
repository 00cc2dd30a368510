"""Bounded driver-side session caches.

The engine keeps a handful of process-global caches keyed by Spark
``applicationId`` (prepared logical plans, the IVF and postings corpus
indexes, layout-job output paths).  They are correct unbounded — keys
include the application id, so a dead session's entries are never served —
but a long-lived driver iterating over many datasets would accumulate
references without limit.  ``bounded_put`` gives every cache the same
FIFO bound: oldest insertion evicted first.  Eviction only drops the
driver-side reference; executor-side blocks (localCheckpoint RDDs) are
released by the ContextCleaner once the DataFrame is unreachable.
"""

from __future__ import annotations

from typing import TypeVar

K = TypeVar("K")
V = TypeVar("V")


def bounded_put(cache: dict[K, V], key: K, value: V, max_entries: int) -> V:
    """Insert ``key → value``, evicting oldest insertions to stay under
    ``max_entries`` (dicts preserve insertion order)."""
    while len(cache) >= max_entries:
        cache.pop(next(iter(cache)))
    cache[key] = value
    return value
