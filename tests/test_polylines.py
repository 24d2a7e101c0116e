"""O21 polyline building: chain merging semantics on hand-built
segments (micro) + conservation invariants on the synthetic data."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMALL

from osm2shp_spark.operators.assemble import assemble_ways
from osm2shp_spark.operators.polylines import build_polylines
from osm2shp_spark.sources.synthetic import synthetic_nodes, synthetic_ways

SEG_SCHEMA = (
    "way_id BIGINT, layer STRING, kind STRING, "
    "lons ARRAY<DOUBLE>, lats ARRAY<DOUBLE>"
)


def _segs(spark, rows):
    return spark.createDataFrame(
        [(i, "roadbig_line", "line", lons, lats) for i, (lons, lats) in enumerate(rows)],
        SEG_SCHEMA,
    )


def test_simple_chain_merges(spark):
    # A-B, B-C, C-D → one polyline A..D
    rows = [
        ([0.0, 1.0], [0.0, 0.0]),
        ([1.0, 2.0], [0.0, 0.0]),
        ([2.0, 3.0], [0.0, 0.0]),
    ]
    out = build_polylines(_segs(spark, rows)).collect()
    assert len(out) == 1
    assert out[0].n_segments == 3
    assert list(out[0].lons) == [0.0, 1.0, 2.0, 3.0]


def test_reversed_segment_joins(spark):
    # second segment stored reversed (C-B): still merges A-B-C
    rows = [([0.0, 1.0], [0.0, 0.0]), ([2.0, 1.0], [0.0, 0.0])]
    out = build_polylines(_segs(spark, rows)).collect()
    assert len(out) == 1
    assert out[0].n_pts == 3


def test_junction_breaks_chain(spark):
    # three segments meeting at one point (degree 3) must NOT merge
    # through the junction
    rows = [
        ([0.0, 1.0], [0.0, 0.0]),
        ([1.0, 2.0], [0.0, 0.0]),
        ([1.0, 1.0], [0.0, 1.0]),
    ]
    out = build_polylines(_segs(spark, rows)).collect()
    assert len(out) == 3


def test_conservation_on_synthetic(spark):
    assembled = assemble_ways(
        synthetic_nodes(spark, SF_SMALL), synthetic_ways(spark, SF_SMALL)
    )
    lines = assembled.filter(F.col("kind") == "line")
    merged = build_polylines(assembled)
    # every input segment lands in exactly one polyline
    assert (
        merged.agg(F.sum("n_segments")).collect()[0][0] == lines.count()
    )
    # polylines never span layers
    assert merged.select("layer").distinct().count() <= lines.select(
        "layer"
    ).distinct().count()
