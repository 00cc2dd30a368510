"""Query registry modules — importing this package registers every query.

Each module covers one slice of SURVEY.md §2's operator inventory; every
query lands with a DuckDB oracle unless its semantics are genuinely not
SQL-expressible (noted per-query).
"""

from lambda_arc_events_filter_spark.queries import (  # noqa: F401
    advanced_q,
    allocation_q,
    analytic_q,
    corpus_stats_q,
    curation_q,
    evaluation_q,
    features_q,
    functions_q,
    lakehouse_q,
    llm_q,
    quality_q,
    relational,
    round4_q,
    sources_q,
    statistics_q,
    streaming_q,
    timeseries_q,
    udf_q,
    windows,
)
