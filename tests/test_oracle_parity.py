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
