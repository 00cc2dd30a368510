"""Python UDF surface — SURVEY.md §2 B70-B73.

These exist to prove the escape hatch, not to use it: every other operator
in the engine is Catalyst-native.  All four variants are Arrow-batched
(pandas UDF / applyInPandas / UDTF) — never row-at-a-time Python — and all
function bodies are closures (serialized by value; workers don't import
this package).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from lambda_arc_events_filter_spark.catalog import load
from lambda_arc_events_filter_spark.registry import register


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)
             AS settled_price
    FROM lineitem
    WHERE l_quantity > 40
    """,
    tags=("udf",),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B70 vectorized scalar pandas UDF (Arrow batches, ~10-100× faster
    than row-at-a-time Python).  The arithmetic is plain double ops so the
    SQL oracle reproduces it exactly; rounding happens JVM-side after."""

    @F.pandas_udf("double")
    def settle(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1.0 - disc) * (1.0 + tax)

    l = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 40)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            settle("l_extendedprice", "l_discount", "l_tax"), 6
        ).alias("settled_price"),
    )


@register(
    "udf_grouped_map",
    oracle="""
    SELECT event_id, user_id,
           value - min(value) OVER (PARTITION BY user_id) AS value_offset,
           CAST(value = min(value) OVER (PARTITION BY user_id) AS BOOLEAN)
             AS is_group_min
    FROM events
    """,
    tags=("udf",),
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B71 grouped-map applyInPandas: per-user offset from the group
    minimum.

    Centering against min (an exact data value) instead of mean is
    deliberate: a mean is an aggregation whose summation ORDER differs
    between pandas and any SQL engine, which drifts the last ulp and trips
    rounding boundaries (observed with mean-centering at sf0.01: a 6-digit
    exact half rounded half-even by numpy, half-away by DuckDB).  min has
    no accumulation at all, so the result is bit-exact with NO rounding.
    """

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf["value"].min()
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "value_offset": pdf["value"] - m,
                "is_group_min": pdf["value"] == m,
            }
        )

    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").applyInPandas(
        center,
        schema="event_id long, user_id long, value_offset double,"
        " is_group_min boolean",
    )


@register(
    "udf_table_function",
    oracle="""
    SELECT o_orderkey, unnest(generate_series(1, 3)) AS installment_no,
           round(o_totalprice / 3, 4) AS installment_amount
    FROM orders
    WHERE o_totalprice > 400000
    """,
    tags=("udf",),
)
def udf_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B72 Python UDTF (Spark 4): one row in → N rows out — an installment
    plan generator for large orders.  Class defined inline (closure rule)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="installment_no int, installment_amount double")
    class Installments:
        def eval(self, total: float):  # noqa: D401
            for i in range(1, 4):
                yield i, round(total / 3, 4)

    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        o.select("o_orderkey", "o_totalprice")
        .lateralJoin(Installments(F.col("o_totalprice").outer()))
        .select("o_orderkey", "installment_no", "installment_amount")
    )


@register(
    "udf_aggregate_equiv",
    oracle="""
    SELECT event_type,
           round(sum(value * (CAST(props->>'k' AS INT) + 1))
                 / sum(CAST(props->>'k' AS INT) + 1), 6) AS weighted_avg_value,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("udf",),
)
def udf_aggregate_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B73 UDAF-equivalent: applyInPandas emitting ONE row per group
    (Python has no native UDAF) — a k-weighted mean of event values.

    Sums accumulate via python float in iteration order of the sorted
    group (sequential, like the SQL SUM over the same rows after the same
    sort) — see the grouped-map note on pandas pairwise summation.
    """

    def wavg(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_id")
        w = pdf["k"] + 1
        num = float(sum(pdf["value"] * w))
        den = float(sum(w))
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "weighted_avg_value": [round(num / den, 6)],
                "n": [len(pdf)],
            }
        )

    e = load(spark, sf_dir, "events").withColumn(
        "k", F.from_json("props", "k INT").getField("k")
    )
    return e.groupBy("event_type").applyInPandas(
        wavg, schema="event_type string, weighted_avg_value double, n long"
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT event_id,
           round(value * 1.07, 4)         AS value_adj,
           CAST(length(event_type) AS INT) AS type_len
    FROM events
    WHERE value > 200
    """,
    tags=("udf",),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third Python boundary: ``mapInArrow`` — the batch-level API
    below pandas (no pandas conversion at all; the function sees raw
    ``pyarrow.RecordBatch``es).  The right boundary when the Python side
    is itself Arrow-native (writing feather/IPC, calling a C++ lib with
    an Arrow FFI, zero-copy into numpy via ``.to_numpy``): skipping the
    pandas round-trip removes a copy per batch in each direction.

    The computation (tax-adjust + a length feature) is deliberately the
    kind of thing production keeps JVM-side — the query exists to pin the
    Arrow-batch path's correctness and its schema contract, like
    udf_pandas_scalar does for the pandas boundary.  Body is a closure
    (pickled by value; workers never import this package).
    """
    import pyarrow as pa_mod

    def adjust(batches):
        for b in batches:
            value = b.column("value")
            etype = b.column("event_type")
            yield pa_mod.RecordBatch.from_arrays(
                [
                    b.column("event_id"),
                    # NO rounding here: pyarrow's decimal round (scale,
                    # round, unscale) lands on a different nearest-double
                    # than Spark/DuckDB round (measured: ...20340000000002
                    # vs ...2034) — the decimal pin happens JVM-side below
                    # where both engines agree
                    pa_mod.compute.multiply(value, 1.07),
                    pa_mod.compute.cast(
                        pa_mod.compute.utf8_length(etype), pa_mod.int32()
                    ),
                ],
                names=["event_id", "value_adj", "type_len"],
            )

    e = load(spark, sf_dir, "events").filter(F.col("value") > 200).select(
        "event_id", "value", "event_type"
    )
    out = e.mapInArrow(
        adjust, schema="event_id long, value_adj double, type_len int"
    )
    return out.withColumn("value_adj", F.round("value_adj", 4))


@register(
    "udf_pandas_iter",
    oracle="""
    SELECT event_id,
           round((exp(2 * (value / 100.0)) - 1)
                 / (exp(2 * (value / 100.0)) + 1) * 2.0 + 1.0, 6)
             AS activation
    FROM events
    """,
    tags=("udf",),
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-series pandas UDF (``Iterator[pd.Series] ->
    Iterator[pd.Series]``): the model-serving shape — expensive state
    (here a stand-in parameter dict; in production a loaded model) is
    initialized ONCE per Python worker, then reused across every Arrow
    batch the worker sees, instead of once per batch like a plain scalar
    pandas UDF.

    At 100 TB this is the difference between loading a model
    tasks×batches times and tasks times.  The math itself (scaled tanh
    activation) is deterministic double arithmetic, so the SQL oracle
    reproduces it exactly; rounding happens JVM-side after the UDF.
    """

    @F.pandas_udf("double")
    def activate(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        # once per worker: the "model load" the iterator form amortizes
        params = {"scale": 100.0, "gain": 2.0, "bias": 1.0}
        for batch in batches:
            yield (
                np.tanh(batch / params["scale"]) * params["gain"]
                + params["bias"]
            )

    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.round(activate("value"), 6).alias("activation"),
    )
