"""Binary ESRI shapefile sink (O14-O16 byte-level parity).

The engine's scale sink is layer-partitioned parquet
(``sources.tables.write_partitioned``); this module adds the
reference's literal output format — one ``<layer>.shp/.shx(/.dbf)`` +
``.prj`` per layer (osm/shapefile.cc:32-49 via shapelib; point layers
carry a single ``name`` C-64 field, osm/handler.cc:67-71, which is
where the reference's 64-char name truncation physically lives;
line/polygon layers have no attribute table at all) — implemented
from the public ESRI Shapefile Technical Description (July 1998) and
the dBASE III header layout. No shapelib, no GDAL.

Scale note: a shapefile is a single sequential file with record
offsets in a side index — an inherently driver-side final export, and
the reference is equally single-node here. The exporter streams one
layer at a time via ``toLocalIterator`` so driver memory is bounded
by one record, not one layer.
"""

from __future__ import annotations

import os
import struct
from typing import Iterable, Iterator

from pyspark.sql import DataFrame

SHPT_POINT = 1
SHPT_ARC = 3
SHPT_POLYGON = 5

#: the reference's .prj payload, verbatim (osm/shapefile.cc:65-79)
PRJ_WKT = (
    'GEOGCS["WGS 84",\n'
    '       DATUM["WGS_1984",\n'
    '            SPHEROID["WGS 84",6378137,298.257223563,\n'
    '                      AUTHORITY["EPSG","7030"]],\n'
    "            TOWGS84[0,0,0,0,0,0,0],\n"
    '             AUTHORITY["EPSG","6326"]],\n'
    '       PRIMEM["Greenwich",0,\n'
    '              AUTHORITY["EPSG","8901"]],\n'
    '       UNIT["degree",0.0174532925199433,\n'
    '            AUTHORITY["EPSG","9108"]],\n'
    '       AUTHORITY["EPSG","4326"]]'
)

_NAME_FIELD_WIDTH = 64  # FTString,64 — osm/shapefile.cc:23


class ShapefileWriter:
    """Streaming writer for one shapefile (.shp/.shx, optional .dbf
    with a single ``name`` C-64 field, and .prj)."""

    def __init__(self, base: str, shp_type: int, with_name_field: bool = False):
        self.base = base
        self.type = shp_type
        self.with_name = with_name_field
        self.shp = open(base + ".shp", "wb")
        self.shx = open(base + ".shx", "wb")
        self.dbf = open(base + ".dbf", "wb") if with_name_field else None
        self.n = 0
        self.bbox = [float("inf"), float("inf"), float("-inf"), float("-inf")]
        self.offset = 100  # bytes; .shp header size
        # headers are back-patched on close
        self.shp.write(b"\0" * 100)
        self.shx.write(b"\0" * 100)
        if self.dbf is not None:
            self.dbf.write(b"\0" * (32 + 32 + 1))  # header + 1 field + 0x0D

    # -- geometry ---------------------------------------------------------

    def _grow_bbox(self, xs: Iterable[float], ys: Iterable[float]) -> None:
        for x in xs:
            self.bbox[0] = min(self.bbox[0], x)
            self.bbox[2] = max(self.bbox[2], x)
        for y in ys:
            self.bbox[1] = min(self.bbox[1], y)
            self.bbox[3] = max(self.bbox[3], y)

    def _record(self, content: bytes) -> None:
        self.n += 1
        words = len(content) // 2
        self.shp.write(struct.pack(">ii", self.n, words))
        self.shp.write(content)
        self.shx.write(struct.pack(">ii", self.offset // 2, words))
        self.offset += 8 + len(content)

    def point(self, x: float, y: float, name: str | None = None) -> None:
        assert self.type == SHPT_POINT
        self._grow_bbox((x,), (y,))
        self._record(struct.pack("<idd", SHPT_POINT, x, y))
        if self.dbf is not None:
            self._dbf_record(name or "")

    def multipoint(self, xs: list[float], ys: list[float]) -> None:
        """One single-part polyline/polygon record (the reference's
        SHPCreateSimpleObject shape, osm/shapefile.cc:43-46)."""
        assert self.type in (SHPT_ARC, SHPT_POLYGON)
        self._grow_bbox(xs, ys)
        n = len(xs)
        content = struct.pack(
            "<idddd", self.type, min(xs), min(ys), max(xs), max(ys)
        )
        content += struct.pack("<iii", 1, n, 0)  # numParts, numPoints, part[0]
        content += b"".join(struct.pack("<dd", x, y) for x, y in zip(xs, ys))
        self._record(content)

    # -- dbf ---------------------------------------------------------------

    def _dbf_record(self, name: str) -> None:
        # DBFWriteStringAttribute truncates at the field width (bytes)
        data = name.encode("utf-8")[:_NAME_FIELD_WIDTH]
        self.dbf.write(b" " + data.ljust(_NAME_FIELD_WIDTH, b" "))

    # -- finalize -----------------------------------------------------------

    def close(self) -> None:
        if self.n == 0:
            self.bbox = [0.0, 0.0, 0.0, 0.0]

        def header(length_bytes: int) -> bytes:
            return (
                struct.pack(">i", 9994)
                + b"\0" * 20
                + struct.pack(">i", length_bytes // 2)
                + struct.pack("<ii", 1000, self.type)
                + struct.pack("<4d", *self.bbox)
                + struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)  # z/m ranges
            )

        self.shp.seek(0)
        self.shp.write(header(self.offset))
        self.shp.close()
        self.shx.seek(0)
        self.shx.write(header(100 + 8 * self.n))
        self.shx.close()
        if self.dbf is not None:
            self.dbf.write(b"\x1a")
            self.dbf.seek(0)
            hdr_size = 32 + 32 + 1
            rec_size = 1 + _NAME_FIELD_WIDTH
            self.dbf.write(
                struct.pack(
                    "<BBBBIHH", 0x03, 95, 7, 26, self.n, hdr_size, rec_size
                )
                + b"\0" * 20
            )
            self.dbf.write(
                b"name".ljust(11, b"\0")
                + b"C"
                + b"\0" * 4
                + struct.pack("<BB", _NAME_FIELD_WIDTH, 0)
                + b"\0" * 14
            )
            self.dbf.write(b"\x0d")
            self.dbf.close()
        with open(self.base + ".prj", "w") as f:
            f.write(PRJ_WKT)


def export_shapefiles(
    points: DataFrame | None,
    ways: DataFrame | None,
    out_dir: str,
) -> dict[str, int]:
    """Write one shapefile per layer from the engine's outputs.

    ``points`` needs (layer, lon, lat, name); ``ways`` needs
    (layer, kind, lons, lats). Layer → file name, kind → shape type
    (line→SHPT_ARC, polygon→SHPT_POLYGON), matching the reference's
    add_shape calls (osm/handler.cc:29-43). Returns per-layer record
    counts. Records stream through ``toLocalIterator`` — bounded
    driver memory."""
    os.makedirs(out_dir, exist_ok=True)
    counts: dict[str, int] = {}
    writers: dict[str, ShapefileWriter] = {}

    def get_writer(layer: str, shp_type: int, with_name: bool) -> ShapefileWriter:
        w = writers.get(layer)
        if w is None:
            w = writers[layer] = ShapefileWriter(
                os.path.join(out_dir, layer), shp_type, with_name
            )
        elif w.type != shp_type:
            # one shapefile holds exactly ONE geometry type (the
            # reference fixes it per layer at declaration,
            # osm/handler.cc:34-43); silently emitting a polygon ring
            # as an ARC record (or vice versa) would hand downstream
            # GIS readers wrong geometry with no error
            raise ValueError(
                f"layer {layer!r}: mixed shape types ({w.type} vs "
                f"{shp_type}) — split the layer or normalize kind "
                "upstream"
            )
        return w

    if points is not None:
        it: Iterator = (
            points.select("layer", "lon", "lat", "name")
            .orderBy("layer", "name", "lon")
            .toLocalIterator()
        )
        for r in it:
            w = get_writer(r.layer, SHPT_POINT, True)
            w.point(r.lon, r.lat, r.name)
    if ways is not None:
        it = (
            ways.select("layer", "kind", "lons", "lats", "way_id")
            .orderBy("layer", "way_id")
            .toLocalIterator()
        )
        for r in it:
            w = get_writer(
                r.layer, SHPT_POLYGON if r.kind == "polygon" else SHPT_ARC, False
            )
            w.multipoint(list(r.lons), list(r.lats))
    for layer, w in writers.items():
        counts[layer] = w.n
        w.close()
    return counts


# ---------------------------------------------------------------------------
# reader (verification only — round-trips what the writer produced)
# ---------------------------------------------------------------------------

def read_shapefile(base: str) -> list[dict]:
    """Parse .shp (+ .dbf if present) back into records. Used by tests
    to verify the writer byte-level: geometry exact, dbf names exact,
    and structural invariants (shx offsets, header lengths)."""
    out = []
    with open(base + ".shp", "rb") as f:
        data = f.read()
    (code,) = struct.unpack_from(">i", data, 0)
    assert code == 9994, "bad file code"
    (length_words,) = struct.unpack_from(">i", data, 24)
    assert length_words * 2 == len(data), "header length mismatch"
    version, shp_type = struct.unpack_from("<ii", data, 28)
    assert version == 1000
    pos = 100
    while pos < len(data):
        _, words = struct.unpack_from(">ii", data, pos)
        pos += 8
        (rtype,) = struct.unpack_from("<i", data, pos)
        if rtype == SHPT_POINT:
            x, y = struct.unpack_from("<dd", data, pos + 4)
            out.append({"type": rtype, "xs": [x], "ys": [y]})
        else:
            nparts, npoints = struct.unpack_from("<ii", data, pos + 36)
            assert nparts == 1
            pts_off = pos + 44 + 4 * nparts
            xs, ys = [], []
            for i in range(npoints):
                x, y = struct.unpack_from("<dd", data, pts_off + 16 * i)
                xs.append(x)
                ys.append(y)
            out.append({"type": rtype, "xs": xs, "ys": ys})
        pos += words * 2
    if os.path.exists(base + ".dbf"):
        with open(base + ".dbf", "rb") as f:
            d = f.read()
        nrec, hdr, rec = struct.unpack_from("<IHH", d, 4)
        assert nrec == len(out)
        for i in range(nrec):
            start = hdr + i * rec + 1  # skip deletion flag
            # errors=replace: the writer byte-truncates at the field
            # width like shapelib, which may split a multibyte char
            name = d[start : start + _NAME_FIELD_WIDTH].rstrip(b" ").decode(
                "utf-8", errors="replace"
            )
            out[i]["name"] = name
    return out
