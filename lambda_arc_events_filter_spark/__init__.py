"""lambda_arc_events_filter_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with (at least) the capabilities of the
reference ``globeandmail/lambda-arc-events-filter`` (an AWS Lambda Kinesis
event filter; see ``/root/reference/README.md:1-2`` — its entire public
surface is "Filters ARC kinesis feed events").  The reference ships no
implementation code, so this engine re-expresses that surface — stream
source → decode → filter → project → sink — on Structured Streaming, and
widens it to a full relational + streaming + LLM-data-pipeline operator
library per SURVEY.md §2, all on the DataFrame/Catalyst stack.

Design tenets (SURVEY.md §4):
- DataFrame/SQL only; no RDDs.  Catalyst does pushdown/pruning/reordering.
- Explicit schemas everywhere (no inference scans) — 100 TB predictability.
- Broadcast small dimensions; AQE handles skew and partition coalescing.
- Python UDFs are a last resort; when unavoidable, Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
