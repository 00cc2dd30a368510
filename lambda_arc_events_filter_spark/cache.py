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


#: RDD ids of session-RESIDENT materializations (corpus indexes: the tf
#: index, the IVF index).  The prepared-plan cache may only cache a plan
#: whose RDD scans all appear here: a resident index is the engine's
#: architecture (build once per session, probe many times — reuse is the
#: point), while any OTHER checkpointed RDD in a query plan is a
#: query-private intermediate whose reuse across executions is result
#: caching and fakes the benchmark (see registry.register).  Ids are
#: monotonically increasing ints; stale ids from evicted indexes are
#: harmless (an RDD id is never reissued), the trim just bounds memory.
RESIDENT_RDD_IDS: set[int] = set()
_RESIDENT_MAX = 4096


def rdd_scan_ids(jplan) -> list[int]:
    """RDD ids of every ``LogicalRDD`` leaf in a JVM logical plan."""
    out: list[int] = []
    leaves = jplan.collectLeaves()
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        if leaf.getClass().getSimpleName() == "LogicalRDD":
            out.append(leaf.rdd().id())
    return out


def bless_resident(df):
    """Mark every RDD scan in ``df``'s plan as session-resident (an index
    whose cross-execution reuse is intended).  Returns ``df`` so builders
    can wrap their ``localCheckpoint()`` call site.  No-op on sessions
    without JVM access (Connect mode)."""
    try:
        ids = rdd_scan_ids(df._jdf.queryExecution().logical())
    except Exception:
        return df
    while len(RESIDENT_RDD_IDS) + len(ids) > _RESIDENT_MAX:
        RESIDENT_RDD_IDS.pop()
    RESIDENT_RDD_IDS.update(ids)
    return df
