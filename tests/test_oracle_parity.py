"""Driver-gate rehearsal: every REGISTRY query vs its DuckDB oracle,
exact values, at sf0.001 (fast) — the driver runs the same at sf0.01."""

from __future__ import annotations

import pytest

from conftest import SF_SMALL
from parity import assert_parity

from osm2shp_spark import queries as Q


def _names():
    return [n for n, (_, sql) in Q.REGISTRY.items() if sql is not None]


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, name):
    fn, sql = Q.REGISTRY[name]
    assert_parity(fn(spark, SF_SMALL), duck.execute(sql).df(), name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()) >= set(e.oracle_sql())
