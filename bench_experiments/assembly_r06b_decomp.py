#!/usr/bin/env python
"""Decompose way_assembly's wall time by pipeline stage (noop sink).

Stages (cumulative):
  ways_build : synthetic ways source incl. the refs collect_list agg
  classified : + classification/rules projections
  exploded   : + posexplode
  joined     : + broadcast node join
  assembled  : + reassembly agg (collect_list/array_sort) + decode
  full       : + gate scalar projection (qsum/qwsum HOFs)
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
from osm2shp_spark.queries import _assembly_scalar_projection, q_way_assembly  # noqa: E402
from osm2shp_spark.session import get_spark  # noqa: E402
from osm2shp_spark.sources.synthetic import synthetic_nodes, synthetic_ways  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def best3(spark, label, make):
    ts = []
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.time()
        noop(make())
        ts.append(time.time() - t0)
    print(f"{label:12s} best={min(ts):6.3f}  samples={[round(t,3) for t in ts]}")
    return min(ts)


def main():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="assembly_decomp", master=f"local[{cpus}]",
                      extra_confs={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    def ways():
        return synthetic_ways(spark, sf)

    def nodes():
        return synthetic_nodes(spark, sf)

    from osm2shp_spark.rules import way_pair_idx_sql

    def exploded():
        return (classify_ways(ways()).select(
            F.col("id").alias("way_id"),
            F.expr(way_pair_idx_sql()).alias("_li"),
            F.col("n_refs").cast("smallint").alias("n_refs"),
            F.posexplode("refs").alias("pos", "ref"),
        ).withColumn("pos", F.col("pos").cast("smallint")))

    def joined():
        e = exploded()
        b = staged_nodes(nodes())
        return e.join(b, e.ref == b.id, "inner").select(
            "way_id", "_li", "n_refs", "pos", "lon", "lat")

    spark.sparkContext.setJobDescription("decomp: warmup")
    noop(q_way_assembly(spark, sf))

    for label, make in [
        ("ways_build", ways),
        ("classified", lambda: classify_ways(ways())),
        ("exploded", exploded),
        ("joined", joined),
        ("assembled", lambda: assemble_ways(nodes(), ways(), compact_pos=True)),
        ("full", lambda: q_way_assembly(spark, sf)),
    ]:
        spark.sparkContext.setJobDescription(f"decomp: {label}")
        best3(spark, label, make)
    spark.stop()


if __name__ == "__main__":
    main()
