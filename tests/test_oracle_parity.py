"""Driver-gate rehearsal: every REGISTRY query vs its DuckDB oracle,
exact values, at sf0.001 (fast) — except the golden-fixture oracles,
which are pinned to the gate's sf0.01 fixture sizes (see
``osm2shp_spark.golden``) and rehearse there like the driver does."""

from __future__ import annotations

import pytest

from conftest import SF_MED, SF_SMALL
from parity import assert_parity

from osm2shp_spark import queries as Q

#: queries whose oracle embeds sf0.01-sized golden fixtures
_SF_PINNED = {
    "image_decode_stats",
    "image_stream_decode",
    "image_features",
    "image_phash_dedup",
    "image_resize",
    "audio_features",
    "image_pip_classify",
    "point_cells",
    "multimodal_pairs",
    "adaptive_cells",
}


def test_registry_fits_driver_window():
    """The round driver records only the first 50 registry entries in
    CORRECTNESS_r{N}.json (observed r03: 55 registered, 50 recorded —
    the overflow silently lost its gate rows). Intra-family physical
    variants therefore share union-tagged gate rows; this guard fails
    the suite the moment a new registration would push an operator out
    of the recorded window again."""
    assert len(Q.REGISTRY) <= 50, (
        f"{len(Q.REGISTRY)} registered queries exceed the driver's "
        "50-row CORRECTNESS window — fold variants into a tagged row "
        "(see way_assembly_strategies) instead of appending"
    )


def _names():
    return [n for n, (_, sql) in Q.REGISTRY.items() if sql is not None]


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, duck_med, name):
    fn, sql = Q.REGISTRY[name]
    if callable(sql):
        sql = sql()
    sf, con = (SF_MED, duck_med) if name in _SF_PINNED else (SF_SMALL, duck)
    assert_parity(fn(spark, sf), con.execute(sql).df(), name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()) >= set(e.oracle_sql())
