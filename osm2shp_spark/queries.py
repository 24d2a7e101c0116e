"""Query registry: every implemented operator exposed as a
(spark_fn, duckdb_oracle_sql) pair for the driver contract
(``__spark_entry__.py``).

The geo tables are derived from the driver parquet with engine-portable
arithmetic (see ``sources.synthetic``), so even the spatial pipeline is
SQL-oracle-checked, not just rows-only. Column names are aliased
identically on both sides — the driver sorts columns by name before
value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm2shp_spark.operators.assemble import assemble_ways, assembly_counters
from osm2shp_spark.operators.classify import classify_nodes
from osm2shp_spark.operators.spatial import (
    dist2_expr,
    knn_join,
    pip_join,
    tile_expr,
    tile_vector_stats,
)
from osm2shp_spark.rules import (
    min_vertex_sql,
    node_layer_sql,
    way_kind_sql,
    way_layer_sql,
)
from osm2shp_spark.sources.synthetic import (
    IMAGES_SQL,
    NODES_SQL,
    RECTS_SQL,
    synthetic_images,
    synthetic_nodes,
    synthetic_rects,
    synthetic_ways,
    ways_sql,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (spark callable, duckdb oracle SQL or None for rows-only)
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Shared oracle CTE prelude (DuckDB dialect)
# ---------------------------------------------------------------------------

def _geo_ctes() -> str:
    return f"""
WITH nodes AS ({NODES_SQL}),
ways AS ({ways_sql('duckdb')}),
staged AS (SELECT id, lon, lat FROM nodes WHERE id > 0),
ways_kinded AS (
    SELECT *, len(refs) AS n_refs FROM (
        SELECT *, {way_kind_sql()} AS kind FROM ways
    ) k
),
ways_routed AS (
    SELECT id, refs, n_refs, kind, {way_layer_sql('kind')} AS layer
    FROM ways_kinded
    WHERE {min_vertex_sql('kind', 'n_refs')}
),
ways_layered AS (SELECT * FROM ways_routed WHERE layer IS NOT NULL),
ways_exploded AS (
    SELECT id, layer, kind, n_refs,
           unnest(refs) AS ref,
           generate_subscripts(refs, 1) AS pos
    FROM ways_layered
),
ways_joined AS (
    SELECT e.id, e.layer, e.kind, e.n_refs, e.pos, s.lon, s.lat
    FROM ways_exploded e JOIN staged s ON e.ref = s.id
),
ways_assembled AS (
    SELECT id AS way_id, layer, kind, CAST(n_refs AS INTEGER) AS n_pts,
           count(*) AS n_resolved,
           list(lon ORDER BY pos) AS lons,
           list(lat ORDER BY pos) AS lats
    FROM ways_joined
    GROUP BY id, layer, kind, n_refs
),
assembled AS (
    SELECT way_id, layer, kind, n_pts, lons, lats
    FROM ways_assembled WHERE n_resolved = n_pts
)
"""


# ---------------------------------------------------------------------------
# Flagship: way-geometry assembly (O3-O5, O7-O13)
# ---------------------------------------------------------------------------

@register(
    "way_assembly",
    _geo_ctes() + "SELECT * FROM assembled",
)
def q_way_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = synthetic_nodes(spark, sf_dir)
    ways = synthetic_ways(spark, sf_dir)
    return assemble_ways(nodes, ways)


# ---------------------------------------------------------------------------
# Node export (O3, O6, O8, O14)
# ---------------------------------------------------------------------------

_NODE_EXPORT_ORACLE = f"""
WITH nodes AS ({NODES_SQL})
SELECT node_id, layer, name, lon, lat FROM (
    SELECT id AS node_id, {node_layer_sql()} AS layer,
           substr(tag_name, 1, 64) AS name, lon, lat
    FROM nodes
    WHERE id > 0 AND tag_name IS NOT NULL
) t WHERE layer IS NOT NULL
"""


@register("node_export", _NODE_EXPORT_ORACLE)
def q_node_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    return classify_nodes(synthetic_nodes(spark, sf_dir))


# ---------------------------------------------------------------------------
# Observability counters (O17)
# ---------------------------------------------------------------------------

_COUNTERS_ORACLE = _geo_ctes() + """
SELECT p.processed_ways, r.routed_ways, e.exported_ways,
       r.routed_ways - e.exported_ways AS dropped_unresolved
FROM (SELECT count(*) AS processed_ways FROM ways) p,
     (SELECT count(*) AS routed_ways FROM ways_layered) r,
     (SELECT count(*) AS exported_ways FROM assembled) e
"""


@register("way_counters", _COUNTERS_ORACLE)
def q_way_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = synthetic_nodes(spark, sf_dir)
    ways = synthetic_ways(spark, sf_dir)
    return assembly_counters(nodes, ways)


# ---------------------------------------------------------------------------
# Spatial joins (N3/N4/N5)
# ---------------------------------------------------------------------------

#: exported place nodes (node_export) as a reusable oracle CTE
_PLACES_CTE = f"""
places AS (
    SELECT node_id, lon, lat FROM (
        SELECT id AS node_id, {node_layer_sql()} AS layer, lon, lat
        FROM nodes WHERE id > 0 AND tag_name IS NOT NULL
    ) t WHERE layer IS NOT NULL
)
"""

_PIP_RECT_ORACLE = f"""
WITH images AS ({IMAGES_SQL}),
rects AS ({RECTS_SQL})
SELECT i.image_id, r.rect_id, r.layer
FROM images i JOIN rects r
  ON  i.lon > r.lon_min AND i.lon < r.lon_max
  AND i.lat > r.lat_min AND i.lat < r.lat_max
"""


@register("pip_rect", _PIP_RECT_ORACLE)
def q_pip_rect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General ray-cast PIP join, exercised on rectangle polygons whose
    truth is SQL interval algebra (the engine runs the full tile-join +
    refine machinery; boundary coincidences excluded by construction)."""
    imgs = synthetic_images(spark, sf_dir).select("image_id", "lon", "lat")
    rects = synthetic_rects(spark, sf_dir).select(
        "rect_id",
        "layer",
        F.array("lon_min", "lon_max", "lon_max", "lon_min", "lon_min").alias("lons"),
        F.array("lat_min", "lat_min", "lat_max", "lat_max", "lat_min").alias("lats"),
    )
    return pip_join(imgs, rects, ("image_id",), ("rect_id", "layer"))


_KNN_ORACLE = f"""
WITH nodes AS ({NODES_SQL}),
images AS ({IMAGES_SQL}),
{_PLACES_CTE},
d AS (
    SELECT i.image_id, p.node_id,
           {dist2_expr('i.lon', 'i.lat', 'p.lon', 'p.lat')} AS dist2
    FROM images i, places p
),
r AS (
    SELECT image_id, node_id, dist2,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY image_id ORDER BY dist2, node_id
           ) AS INTEGER) AS "rank"
    FROM d
)
SELECT image_id, "rank", node_id, dist2 FROM r WHERE "rank" <= 3
"""


@register("knn_places", _KNN_ORACLE)
def q_knn_places(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-NN nearest named place per image point — the scale path
    (tile neighborhood + provable-radius escape to broadcast) checked
    against the SQL brute force."""
    imgs = synthetic_images(spark, sf_dir).select("image_id", "lon", "lat")
    places = classify_nodes(synthetic_nodes(spark, sf_dir)).select(
        "node_id", "lon", "lat"
    )
    return knn_join(imgs, places, k=3)


_TILE_JOIN_ORACLE = f"""
WITH nodes AS ({NODES_SQL}),
images AS ({IMAGES_SQL}),
{_PLACES_CTE},
it AS (
    SELECT {tile_expr('lon')} AS tile_x, {tile_expr('lat')} AS tile_y,
           count(*) AS n_images
    FROM images GROUP BY 1, 2
),
ft AS (
    SELECT {tile_expr('lon')} AS tile_x, {tile_expr('lat')} AS tile_y,
           count(*) AS n_features
    FROM places GROUP BY 1, 2
)
SELECT coalesce(it.tile_x, ft.tile_x) AS tile_x,
       coalesce(it.tile_y, ft.tile_y) AS tile_y,
       coalesce(n_images, 0) AS n_images,
       coalesce(n_features, 0) AS n_features
FROM it FULL OUTER JOIN ft
  ON it.tile_x = ft.tile_x AND it.tile_y = ft.tile_y
"""


@register("tile_vector_join", _TILE_JOIN_ORACLE)
def q_tile_vector_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 raster-tile ↔ vector rollup (images x exported places)."""
    imgs = synthetic_images(spark, sf_dir).select("image_id", "lon", "lat")
    places = classify_nodes(synthetic_nodes(spark, sf_dir)).select(
        "node_id", "lon", "lat"
    )
    return tile_vector_stats(imgs, places)


# ---------------------------------------------------------------------------
# Driver contract surface
# ---------------------------------------------------------------------------

def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
