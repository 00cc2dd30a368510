"""Oracle-differential tests: every registered query vs its DuckDB oracle.

This is the same comparison the driver's correctness gate performs
(row count + schema + order-insensitive values), run at sf0.001 for speed;
``tools/check.py /root/testdata/sf0.01`` is the full-scale mirror.
"""

from __future__ import annotations

import pytest

from lambda_arc_events_filter_spark.registry import specs
from lambda_arc_events_filter_spark.testing import check_query

ALL = specs()


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    problems = check_query(ALL[name], spark, duck, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize(
    "name",
    [
        # one per plan-shape family that stresses optimizer idempotency:
        # window+agg diamond, decorrelated subquery, generator, rollup,
        # banded-rank helper, multi-window streak chain
        "q01_pricing_summary",
        "subquery_correlated",
        "fn_generator_outer",
        "agg_rollup",
        "lineitem_pareto_abc",
        "tokens_bpe_merge_rounds",
    ],
)
def test_prepared_plan_reuse_matches_build(name, spark, sf_dir):
    """The registry caches the OPTIMIZED plan (registry.py r10); a reused
    execution must be value-identical to the build execution.  The full
    registry-wide proof is the SPARK_GRAFT_CHECK_REUSE=1 sweep
    (SWEEP_r10_reuse.txt); this pins the property per plan-shape family
    so an optimizer-idempotency regression fails fast in CI."""
    from lambda_arc_events_filter_spark.testing import compare_pandas_strict

    spec = ALL[name]
    build = spec.fn(spark, sf_dir).toPandas()  # fills the plan cache
    reused = spec.fn(spark, sf_dir).toPandas()  # served from cached plan
    problems = compare_pandas_strict(reused, build)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_registry_contract():
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "registry must not be empty"
    assert set(oracles) <= set(qs)
    # every query callable takes (spark, sf_dir)
    for fn in qs.values():
        assert callable(fn)
