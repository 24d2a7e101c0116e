"""Z-order layout tests: Morton key correctness (NumPy + DuckDB
twins), range decomposition superset/merge properties, the
writer/reader pair (exactness vs a plain bbox filter), file-level
locality, and scan pruning visible in the plan."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from osm2shp_spark.functions import zorder as Z


def _ref_zkey(lon: float, lat: float) -> int:
    n = (1 << Z.BITS) - 1
    qx = max(0, min(n, int(np.floor((lon - 8.0) / 1.0 * n))))
    qy = max(0, min(n, int(np.floor((lat - 47.0) / 1.0 * n))))
    return Z._interleave_int(qx, qy)


def _grid_points(spark, nx: int = 17, ny: int = 13):
    pts = [
        (i * ny + j, 8.0 + i / (nx - 1), 47.0 + j / (ny - 1))
        for i in range(nx)
        for j in range(ny)
    ]
    return pts, spark.createDataFrame(pts, "id LONG, lon DOUBLE, lat DOUBLE")


class TestZKey:
    def test_matches_bitwise_reference(self, spark):
        pts, df = _grid_points(spark)
        got = {
            r.id: r.zkey
            for r in df.select(
                "id", Z.zkey_col(F.col("lon"), F.col("lat")).alias("zkey")
            ).collect()
        }
        for pid, lon, lat in pts:
            assert got[pid] == _ref_zkey(lon, lat), (pid, lon, lat)

    def test_sql_twin_in_duckdb(self):
        con = duckdb.connect()
        rows = con.execute(
            "SELECT lon, lat, "
            + Z.zkey_sql("lon", "lat")
            + " AS zkey FROM (SELECT 8.0 + (i % 101) / 100.0 AS lon, "
            "47.0 + ((i * 7) % 101) / 100.0 AS lat "
            "FROM generate_series(0, 300) t(i))"
        ).fetchall()
        for lon, lat, zkey in rows:
            assert zkey == _ref_zkey(lon, lat)

    def test_key_orders_space(self):
        """Interleaving property: points sharing a quadtree cell are
        contiguous in key space — the level-L prefix IS the cell."""
        for lon, lat in ((8.3, 47.9), (8.77, 47.01)):
            z = _ref_zkey(lon, lat)
            n = (1 << Z.BITS) - 1
            qx = int(np.floor((lon - 8.0) * n))
            qy = int(np.floor((lat - 47.0) * n))
            for level in (4, 8, 12):
                s = Z.BITS - level
                assert z >> (2 * s) == Z._interleave_int(
                    (qx >> s) << s, (qy >> s) << s
                ) >> (2 * s)


class TestRanges:
    BOXES = [
        (8.2, 47.3, 8.4, 47.5),
        (8.0, 47.0, 9.0, 48.0),
        (8.5, 47.5, 8.50001, 47.50001),
        (8.01, 47.93, 8.97, 47.99),
    ]

    def test_superset_and_merged(self):
        rng = np.random.default_rng(3)
        for box in self.BOXES:
            ranges = Z.zkey_ranges(box)
            assert ranges == sorted(ranges)
            for (a0, b0), (a1, _) in zip(ranges, ranges[1:]):
                assert a1 > b0 + 1  # adjacent intervals were merged
            lons = rng.uniform(box[0], box[2], 200)
            lats = rng.uniform(box[1], box[3], 200)
            for lon, lat in zip(lons, lats):
                z = _ref_zkey(float(lon), float(lat))
                assert any(a <= z <= b for a, b in ranges), (lon, lat)

    def test_full_extent_is_one_range(self):
        assert Z.zkey_ranges((8.0, 47.0, 9.0, 48.0)) == [(0, (1 << 32) - 1)]

    def test_small_bbox_is_tight(self):
        """A 0.2x0.2 bbox (4% of the extent's area) must cover far less
        than the full keyspace — this is the pruning the layout exists
        for (guards the coarsest-first regression where every query
        decomposed to the single full-range interval)."""
        ranges = Z.zkey_ranges((8.2, 47.3, 8.4, 47.5))
        covered = sum(b - a + 1 for a, b in ranges)
        assert covered < (1 << 32) // 10, covered
        assert len(ranges) >= 2  # de-vacuouses the merge assertion

    def test_tiny_bbox_covers_order_of_cells(self):
        ranges = Z.zkey_ranges((8.5, 47.5, 8.50001, 47.50001))
        covered = sum(b - a + 1 for a, b in ranges)
        assert covered <= 64 * 4  # finest-level cells only


class TestLayout:
    @pytest.fixture(scope="class")
    def layout(self, spark, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("zl") / "pts")
        rng = np.random.default_rng(11)
        pdf = [
            (int(i), float(lon), float(lat))
            for i, (lon, lat) in enumerate(
                zip(rng.uniform(8, 9, 4000), rng.uniform(47, 48, 4000))
            )
        ]
        df = spark.createDataFrame(pdf, "id LONG, lon DOUBLE, lat DOUBLE")
        Z.zorder_write(df, path, target_files=8)
        return path, df

    def test_read_bbox_exact(self, spark, layout):
        path, df = layout
        box = (8.2, 47.3, 8.45, 47.62)
        got = sorted(r.id for r in Z.read_bbox(spark, path, box).collect())
        want = sorted(
            r.id
            for r in df.filter(
                (F.col("lon") >= box[0]) & (F.col("lon") <= box[2])
                & (F.col("lat") >= box[1]) & (F.col("lat") <= box[3])
            ).collect()
        )
        assert got == want and len(want) > 0

    def test_files_are_key_disjoint(self, layout):
        """repartitionByRange gives each file a contiguous, pairwise
        disjoint zkey interval — the precondition for file pruning."""
        path, _ = layout
        import glob

        spans = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.read_metadata(f)
            idx = md.schema.names.index("zkey")
            mins, maxs = [], []
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            spans.append((min(mins), max(maxs)))
        spans.sort()
        assert len(spans) >= 4
        for (_, b0), (a1, _) in zip(spans, spans[1:]):
            assert a1 > b0

    def test_bbox_scan_prunes(self, spark, layout):
        """The zkey range predicates reach the parquet scan, and a
        small bbox touches a strict subset of the files."""
        path, _ = layout
        box = (8.1, 47.1, 8.15, 47.15)
        plan = Z.read_bbox(spark, path, box)._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "zkey" in plan
        touched = {
            r[0]
            for r in Z.read_bbox(spark, path, box)
            .select(F.input_file_name())
            .distinct()
            .collect()
        }
        import glob

        assert len(touched) < len(glob.glob(path + "/*.parquet"))
