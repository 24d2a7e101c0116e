"""osm2shp_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the *capabilities* of minad/osm2shp
(reference at /root/reference, MIT) as a distributed, DataFrame-first
engine:

- the reference's sqlite node-lookup staging (osm/point_database.cc)
  becomes a broadcast / sort-merge node→way-ref join,
- way geometries are assembled with order-preserving Catalyst
  aggregation (sort_array(collect_list(...))),
- assembled geometries and georeferenced image rows get hierarchical
  cell indexes (S2 tokens + an aperture-7 hex grid, res 7-12) for
  point-in-polygon layer classification, kNN nearest-feature, and
  raster-tile↔vector joins,
- skew is handled with salting + AQE, lineage is checkpointed
  per-partition to a manifest table for resumability.

Everything heavy is either pure Catalyst (JVM, whole-stage codegen) or
Arrow-vectorized pandas UDFs — no per-row Python in any hot path.
"""

__version__ = "0.1.0"
