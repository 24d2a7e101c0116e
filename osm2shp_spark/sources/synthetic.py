"""Deterministic synthetic geo tables derived from the driver parquet.

The driver's correctness gate compares Spark queries against DuckDB SQL
over the SAME pre-registered tables (region..embeddings). To give the
spatial pipeline *real* SQL oracles (not rows-only checks), the geo
tables — OSM-shaped ``nodes``/``ways`` (SURVEY §1.1) and georeferenced
``images`` points (BASELINE input_hint) — are derived from those
tables
with pure integer/IEEE arithmetic that Spark SQL and DuckDB evaluate
bit-identically. No randomness, no external data; the derivation *is*
the fixture.

Derivations:

- ``nodes``  ← ``part``  (id=p_partkey; lon/lat from modular hashing in
  bbox [8,9)x[47,48) with a deliberate hot cluster for skew tests;
  place/name tags incl. NULL-name, no-rule 'hamlet', >64-char names)
  ∪ ``region`` (a few id<=0 rows for the staging filter edge,
  reference osm/handler.cc:87-88)
- ``ways``   ← ``lineitem`` grouped by l_orderkey (refs ordered by
  l_linenumber; ~1/53 ways get one unresolved ref → all-or-nothing
  drop, reference osm/point_database.cc:104-109; polygon-tagged ways
  get the closed-ring first==last duplicate ref; 17 tag buckets cover
  every rule row + the conflict/typo edges, reference
  osm/handler.cc:45-56,127-133)
- ``images`` ← ``orders`` (georeferenced points; caption from driver
  columns; 1/7 land in the hot cluster for skew)
- ``rects``  ← ``nation`` (axis-aligned polygon features whose
  point-in-polygon truth is interval algebra — SQL-expressible — while
  the engine runs its general ray-cast PIP operator on them)

Only dialect-divergent fragment: ordered array aggregation
(DuckDB ``list(x ORDER BY pos)`` vs Spark
``transform(array_sort(collect_list(struct(pos, x))), s -> s.x)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from osm2shp_spark.sources.tables import register_driver_tables

# ---------------------------------------------------------------------------
# nodes
# ---------------------------------------------------------------------------

# Hot cluster: ~10% of nodes in a ~0.01 x 0.01 deg cell (skew fixture).
_LON = (
    "CASE WHEN p_partkey % 10 = 0 "
    "THEN 8.5e0 + (p_partkey % 89) / 8900.0e0 "
    "ELSE 8.0e0 + (p_partkey % 997) / 997.0e0 END"
)
_LAT = (
    "CASE WHEN p_partkey % 10 = 0 "
    "THEN 47.5e0 + ((p_partkey * 7) % 89) / 8900.0e0 "
    "ELSE 47.0e0 + ((p_partkey * 7919) % 997) / 997.0e0 END"
)

NODES_SQL = f"""
SELECT CAST(p_partkey AS BIGINT) AS id,
       {_LON} AS lon,
       {_LAT} AS lat,
       CASE p_partkey % 23 WHEN 0 THEN 'city' WHEN 1 THEN 'town'
            WHEN 2 THEN 'suburb' WHEN 3 THEN 'village' WHEN 4 THEN 'hamlet'
            ELSE NULL END AS tag_place,
       CASE WHEN p_partkey % 5 = 0 THEN NULL
            WHEN p_partkey % 11 = 0 THEN repeat(p_name, 4)
            ELSE p_name END AS tag_name
FROM part
UNION ALL
SELECT CAST(-(r_regionkey) AS BIGINT) AS id,
       8.1e0 AS lon, 47.1e0 AS lat,
       'city' AS tag_place, r_name AS tag_name
FROM region
"""

# ---------------------------------------------------------------------------
# ways
# ---------------------------------------------------------------------------

#: l_orderkey % 17 tag buckets. Coverage notes:
#:  0 motorway / 1 trunk / 2 primary / 3 secondary  → road rules 1-4
#:  4 residential → no rule (dropped)
#:  5 railway=rail / 6 river / 7 canal / 8 natural=water → rules 5,10,11,12
#:  9 natural=land → polygon kind, no rule (dropped)
#: 10 natural=wood → NOT area (upstream 'woord' typo) → line, no rule
#: 11 natural=woord → area → polygon, no rule (dropped)
#: 12 river + landuse=farm → polygon-typed river → dropped
#:    (kind-before-layer, handler.cc:111)
#: 13 motorway + area=yes → polygon-typed motorway → dropped
#: 14 untagged / 15 canal / 16 primary
_POLYGON_BUCKETS = "(8, 9, 11, 12, 13)"

_WAY_TAGS = """
       CASE id % 17 WHEN 0 THEN 'motorway' WHEN 1 THEN 'trunk'
            WHEN 2 THEN 'primary' WHEN 3 THEN 'secondary'
            WHEN 4 THEN 'residential' WHEN 13 THEN 'motorway'
            WHEN 16 THEN 'primary' ELSE NULL END AS tag_highway,
       CASE id % 17 WHEN 5 THEN 'rail' ELSE NULL END AS tag_railway,
       CASE id % 17 WHEN 6 THEN 'river' WHEN 7 THEN 'canal'
            WHEN 12 THEN 'river' WHEN 15 THEN 'canal'
            ELSE NULL END AS tag_waterway,
       CASE id % 17 WHEN 8 THEN 'water' WHEN 9 THEN 'land'
            WHEN 10 THEN 'wood' WHEN 11 THEN 'woord'
            ELSE NULL END AS tag_natural,
       CASE id % 17 WHEN 12 THEN 'farm' ELSE NULL END AS tag_landuse,
       CASE id % 17 WHEN 13 THEN 'yes' ELSE NULL END AS tag_area
"""

_WAY_REFS_SRC = """
SELECT CAST(l_orderkey AS BIGINT) AS id,
       CASE WHEN l_orderkey % 53 = 0 AND l_linenumber = 1
            THEN CAST(-999999 AS BIGINT) ELSE CAST(l_partkey AS BIGINT)
            END AS ref,
       l_linenumber AS pos
FROM lineitem
"""


def ways_sql(dialect: str) -> str:
    """Full ways derivation for ``dialect`` in {'spark', 'duckdb'}."""
    if dialect == "duckdb":
        # tie-break by ref: l_linenumber is not unique per order in the
        # driver data; Spark's array_sort(struct(pos, ref)) sorts by both
        agg = "list(ref ORDER BY pos, ref)"
        ring = "list_append(refs0, refs0[1])"
        ln = "len(refs0)"
    elif dialect == "spark":
        agg = "transform(array_sort(collect_list(struct(pos, ref))), s -> s.ref)"
        ring = "concat(refs0, array(element_at(refs0, 1)))"
        ln = "size(refs0)"
    else:  # pragma: no cover
        raise ValueError(dialect)
    return f"""
SELECT id,
       CASE WHEN id % 17 IN {_POLYGON_BUCKETS} AND {ln} >= 2
            THEN {ring} ELSE refs0 END AS refs,
       {_WAY_TAGS}
FROM (
    SELECT id, {agg} AS refs0
    FROM ({_WAY_REFS_SRC}) way_refs
    GROUP BY id
) grouped
"""


#: mega-way fixture (N6 skew): one way whose ref count crosses the
#: salted-assembly threshold (operators.assemble.MEGA_WAY_THRESHOLD).
#: Refs cycle through node ids 1..199 — present at every sf (part has
#: >=200 rows even at sf0.001) and never dropped by staging — so the
#: way fully resolves and the all-or-nothing rule keeps it.
MEGA_WAY_ID = 1_000_000_001
MEGA_WAY_REFS = 60_000


def mega_ways_sql(dialect: str) -> str:
    """``ways_sql`` plus the appended mega-way row (same columns)."""
    if dialect == "duckdb":
        refs = (
            f"list_transform(range(0, {MEGA_WAY_REFS}), "
            "i -> CAST((i * 7919) % 199 + 1 AS BIGINT))"
        )
        null_s = "CAST(NULL AS VARCHAR)"
    elif dialect == "spark":
        refs = (
            f"transform(sequence(0, {MEGA_WAY_REFS - 1}), "
            "i -> CAST((i * 7919) % 199 + 1 AS BIGINT))"
        )
        null_s = "CAST(NULL AS STRING)"
    else:  # pragma: no cover
        raise ValueError(dialect)
    return f"""
{ways_sql(dialect)}
UNION ALL
SELECT CAST({MEGA_WAY_ID} AS BIGINT) AS id,
       {refs} AS refs,
       'motorway' AS tag_highway,
       {null_s} AS tag_railway,
       {null_s} AS tag_waterway,
       {null_s} AS tag_natural,
       {null_s} AS tag_landuse,
       {null_s} AS tag_area
"""


# ---------------------------------------------------------------------------
# images (georeferenced points; binary payloads live in fixtures.py)
# ---------------------------------------------------------------------------

IMAGES_SQL = """
SELECT 'img-' || CAST(o_orderkey AS VARCHAR(32)) AS image_id,
       CAST(o_orderkey AS BIGINT) AS img_key,
       CASE WHEN o_orderkey % 7 = 0
            THEN 8.5e0 + (o_orderkey % 83) / 8300.0e0
            ELSE 8.0e0 + ((o_orderkey * 131) % 9973) / 9973.0e0 END AS lon,
       CASE WHEN o_orderkey % 7 = 0
            THEN 47.5e0 + ((o_orderkey * 3) % 83) / 8300.0e0
            ELSE 47.0e0 + ((o_orderkey * 137) % 9973) / 9973.0e0 END AS lat,
       o_orderpriority AS caption
FROM orders
"""

# ---------------------------------------------------------------------------
# rects — axis-aligned polygon features with SQL-checkable PIP truth
# ---------------------------------------------------------------------------

# 25 nations → 25 rectangles tiling part of the bbox; width/height 0.15
# deg so points hit interiors; bounds are multiples of 0.01 while probe
# coords sit on 1/9973 or 1/8300 grids → no boundary coincidences.
RECTS_SQL = """
SELECT CAST(n_nationkey AS BIGINT) AS rect_id,
       8.0e0 + (n_nationkey % 5) * 0.2e0 AS lon_min,
       8.0e0 + (n_nationkey % 5) * 0.2e0 + 0.15e0 AS lon_max,
       47.0e0 + floor(n_nationkey / 5) * 0.2e0 AS lat_min,
       47.0e0 + floor(n_nationkey / 5) * 0.2e0 + 0.15e0 AS lat_max,
       CASE WHEN n_nationkey % 3 = 0 THEN 'water_area' ELSE 'landuse_area'
            END AS layer
FROM nation
"""


def _run(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_driver_tables(spark, sf_dir)
    return spark.sql(sql)


def synthetic_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, NODES_SQL)


def synthetic_ways(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, ways_sql("spark"))


def synthetic_mega_ways(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, mega_ways_sql("spark"))


def synthetic_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, IMAGES_SQL)


def synthetic_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, RECTS_SQL)
