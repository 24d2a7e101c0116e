"""Binary shapefile sink (O14-O16): byte-level round-trip of the
writer's .shp/.shx/.dbf/.prj against the engine's point/way outputs,
plus the reference's structural conventions (name C-64 field on point
layers only, exact .prj WKT, single-part records)."""

from __future__ import annotations

import os
import struct

import pytest

from conftest import SF_SMALL

from osm2shp_spark.operators.assemble import assemble_ways
from osm2shp_spark.operators.classify import classify_nodes
from osm2shp_spark.sources.shapefile import (
    PRJ_WKT,
    SHPT_ARC,
    SHPT_POINT,
    SHPT_POLYGON,
    export_shapefiles,
    read_shapefile,
)
from osm2shp_spark.sources.synthetic import synthetic_nodes, synthetic_ways


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shp"))
    points = classify_nodes(synthetic_nodes(spark, SF_SMALL))
    ways = assemble_ways(
        synthetic_nodes(spark, SF_SMALL), synthetic_ways(spark, SF_SMALL)
    )
    counts = export_shapefiles(points, ways, out)
    return out, counts, points.collect(), ways.collect()


def test_counts_match_dataframes(exported):
    out, counts, point_rows, way_rows = exported
    from collections import Counter

    want = Counter(r.layer for r in point_rows)
    want.update(r.layer for r in way_rows)
    assert counts == dict(want)


def test_point_layer_round_trip(exported):
    out, counts, point_rows, _ = exported
    layer = point_rows[0].layer
    recs = read_shapefile(os.path.join(out, layer))
    want = sorted(
        (r.name, r.lon, r.lat) for r in point_rows if r.layer == layer
    )
    got = sorted((r["name"], r["xs"][0], r["ys"][0]) for r in recs)
    assert got == want  # exact doubles + exact truncated names
    assert all(r["type"] == SHPT_POINT for r in recs)


def test_way_layer_round_trip(exported):
    out, counts, _, way_rows = exported
    layers = {r.layer: r.kind for r in way_rows}
    for layer, kind in layers.items():
        recs = read_shapefile(os.path.join(out, layer))
        want_type = SHPT_POLYGON if kind == "polygon" else SHPT_ARC
        assert all(r["type"] == want_type for r in recs)
        want = sorted(
            (tuple(r.lons), tuple(r.lats))
            for r in way_rows
            if r.layer == layer
        )
        got = sorted((tuple(r["xs"]), tuple(r["ys"])) for r in recs)
        assert got == want
        # line/polygon layers carry no attribute table (handler.cc:69-71)
        assert not os.path.exists(os.path.join(out, layer + ".dbf"))


def test_prj_is_reference_text(exported):
    out, counts, point_rows, _ = exported
    layer = point_rows[0].layer
    with open(os.path.join(out, layer + ".prj")) as f:
        assert f.read() == PRJ_WKT
    # reference text, not a paraphrase
    assert 'AUTHORITY["EPSG","4326"]' in PRJ_WKT


def test_shx_offsets_consistent(exported):
    out, counts, point_rows, _ = exported
    layer = point_rows[0].layer
    base = os.path.join(out, layer)
    with open(base + ".shx", "rb") as f:
        shx = f.read()
    with open(base + ".shp", "rb") as f:
        shp = f.read()
    n = (len(shx) - 100) // 8
    assert n == counts[layer]
    for i in range(n):
        off_w, len_w = struct.unpack_from(">ii", shx, 100 + 8 * i)
        rec_no, rec_len = struct.unpack_from(">ii", shp, off_w * 2)
        assert rec_no == i + 1
        assert rec_len == len_w


def test_mixed_kind_layer_raises(spark, tmp_path):
    """One shapefile holds exactly one geometry type (the reference
    fixes it per layer at declaration): a layer carrying both line and
    polygon kinds must fail fast, not silently write polygon rings as
    ARC records."""
    ways = spark.createDataFrame(
        [
            ("water", "line", 1, [8.0, 8.1], [47.0, 47.1]),
            ("water", "polygon", 2, [8.0, 8.1, 8.1, 8.0], [47.0, 47.0, 47.1, 47.0]),
        ],
        "layer STRING, kind STRING, way_id LONG, "
        "lons ARRAY<DOUBLE>, lats ARRAY<DOUBLE>",
    )
    with pytest.raises(ValueError, match="mixed shape types"):
        export_shapefiles(None, ways, str(tmp_path / "mixed"))
