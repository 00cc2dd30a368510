"""Central query registry wired into ``__spark_entry__.py``.

Every operator from SURVEY.md §2 lands here as a named query: a Spark
callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a
DuckDB oracle SQL string.  The driver's correctness gate runs both at
sf0.01 and compares row-count + schema + order-insensitive value-hash.

Column-name parity rule: alias every computed column identically in the
Spark code and the oracle SQL (the driver sorts columns by name before
hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry.

    ``oracle`` is DuckDB SQL over the pre-registered fixture views; omit it
    only for genuinely non-SQL-expressible operators (custom stateful
    streaming, approximate sketches) — the driver then records a weaker
    rows-only check, and the judge sees which.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import for side effect: query modules self-register on import.
    from lambda_arc_events_filter_spark import queries as _q  # noqa: F401


def specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def all_queries() -> dict[str, QueryFn]:
    return {name: s.fn for name, s in specs().items()}


def all_oracles() -> dict[str, str]:
    return {name: s.oracle for name, s in specs().items() if s.oracle is not None}
