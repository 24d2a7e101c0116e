"""VERDICT-r4 #4 experiment: way_assembly exchange byte-diet.

The r4 decomposition (assembly_split*.py) showed the reassembly
exchange ~= a raw ``repartition(way_id)`` floor — time tracks bytes
through the exchange. The remaining byte lever: the post-join row
carries (lon double, lat double) = two 8-byte UnsafeRow slots, and the
partial-agg buffers carry 3-field structs (pos, lon, lat) ~= 32 B per
vertex in UnsafeArrayData. OSM coordinates are natively 100-nanodegree
fixed point (PBF spec: granularity=100, lat = .000000001 * granularity
* lat_i), so for OSM-sourced nodes (lon, lat) packs LOSSLESSLY into one
bigint: (lonI << 32) | (latI & 0xffffffff) — one slot instead of two,
2-field structs (~24 B/vertex) instead of 3.

This script measures, at the scaling-stage workload shape (R=128
replication, local[32], shuffle width 128):

  A. current general path (compact_pos=True)         — baseline
  B. packed-bigint coord through both exchanges      — the diet
  C. raw repartition(way_id) of the post-join rows   — exchange floor

B is measured on 1e-7-quantized input (the regime where the packing is
exact); A is measured on the same quantized input so the comparison is
bytes-only, not data-dependent.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from osm2shp_spark.operators.assemble import assemble_ways  # noqa: E402
from osm2shp_spark.operators.classify import classify_ways, staged_nodes  # noqa: E402
from osm2shp_spark.session import get_spark  # noqa: E402
from osm2shp_spark.sources.synthetic import (  # noqa: E402
    synthetic_nodes,
    synthetic_ways,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
R = 128


def packed_assembly(nodes, ways):
    """The byte-diet plan — now shipped as
    ``assemble_ways(..., compact_pos=True, quantized=True)``
    (operators/assemble.py). The original inline prototype measured
    here had the identical exchange shape (the post-agg decode is
    column-pruned under count())."""
    return assemble_ways(nodes, ways, compact_pos=True, quantized=True)


def main():
    spark = get_spark(
        app_name="bytediet",
        master="local[32]",
        extra_confs={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": "128",
        },
    )
    par = 128
    # 1e-7-quantized nodes: the regime the packing targets (OSM-native)
    nodes = (
        synthetic_nodes(spark, SF)
        .withColumn("lon", F.expr("round(lon * 1e7) / 1e7"))
        .withColumn("lat", F.expr("round(lat * 1e7) / 1e7"))
        .cache()
    )
    nodes.count()
    rep = F.explode(F.sequence(F.lit(1), F.lit(R))).alias("rep")
    ways_rep = (
        synthetic_ways(spark, SF)
        .select("*", rep)
        .withColumn("id", F.col("id") * R + F.col("rep"))
        .drop("rep")
        .repartition(par)
        .cache()
    )
    n = ways_rep.count()
    print(f"ways x{R}: {n} rows", file=sys.stderr)

    # exchange floor: the post-join projection, one repartition, count
    def floor():
        classified = classify_ways(ways_rep)
        from osm2shp_spark.rules import way_pair_idx_sql

        exploded = classified.select(
            F.col("id").alias("way_id"),
            F.expr(way_pair_idx_sql()).alias("_li"),
            F.col("n_refs").cast("smallint").alias("n_refs"),
            F.posexplode("refs").alias("pos", "ref"),
        ).withColumn("pos", F.col("pos").cast("smallint"))
        build = staged_nodes(nodes)
        j = exploded.join(build, exploded.ref == build.id, "inner").select(
            "way_id", "_li", "n_refs", "pos", "lon", "lat"
        )
        return j.repartition("way_id").count()

    variants = {
        "A_current": lambda: assemble_ways(nodes, ways_rep, compact_pos=True).count(),
        "B_packed": lambda: packed_assembly(nodes, ways_rep).count(),
        "C_repartition_floor": floor,
    }
    # sanity: identical surviving-way counts
    ca = variants["A_current"]()
    cb = variants["B_packed"]()
    assert ca == cb, (ca, cb)
    print(f"rows A==B: {ca}", file=sys.stderr)

    best = {k: 1e9 for k in variants}
    for _ in range(3):
        for k, fn in variants.items():
            t0 = time.time()
            fn()
            best[k] = min(best[k], time.time() - t0)
            print(f"{k}: {time.time() - t0:.2f}s (best {best[k]:.2f})",
                  file=sys.stderr, flush=True)
    print({k: round(v, 2) for k, v in best.items()})
    spark.stop()


if __name__ == "__main__":
    main()
