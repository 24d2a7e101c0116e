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

from osm2shp_spark.operators.assemble import assemble_ways, assembly_counters
from osm2shp_spark.operators.classify import classify_nodes
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
    synthetic_nodes,
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
# Driver contract surface
# ---------------------------------------------------------------------------

def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
