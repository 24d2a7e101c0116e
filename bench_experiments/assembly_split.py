"""Round-5 prep: split way_assembly stage time into its two shuffles
at the iso 8-executor level (same input as bench's scaling stage).

  t_join  = explode + ref->node join only (shuffle 1, no groupBy)
  t_full  = the full operator (shuffle 1 + reassembly groupBy shuffle 2)

If t_full - t_join << t_join, bucketing/exchange-reuse on the join is
the round-5 lever; if the groupBy dominates, shrink shuffle-2 bytes or
pre-assemble runs instead. Experiment only -- measured code untouched."""
import os, sys, time
os.chdir("/root/repo"); sys.path.insert(0, "/root/repo")
import bench
from pyspark.sql import functions as F
from osm2shp_spark.operators.assemble import assemble_ways
from osm2shp_spark.operators.classify import classify_ways, staged_nodes
from osm2shp_spark.rules import way_pair_idx_sql
from osm2shp_spark.sources.synthetic import synthetic_nodes, synthetic_ways

spark = bench._spark_isolated(32, "assembly_split")
spark.conf.set("spark.sql.shuffle.partitions", "128")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"
R, par = 128, 128

nodes = synthetic_nodes(spark, sf_dir).cache(); nodes.count()
rep = F.explode(F.sequence(F.lit(1), F.lit(R))).alias("rep")
ways_rep = (
    synthetic_ways(spark, sf_dir)
    .select("*", rep)
    .withColumn("id", F.col("id") * R + F.col("rep"))
    .drop("rep")
    .repartition(par)
    .cache()
)
n_ways = ways_rep.count()

def join_only():
    classified = classify_ways(ways_rep)
    exploded = classified.select(
        F.col("id").alias("way_id"),
        F.expr(way_pair_idx_sql()).alias("_li"),
        "n_refs",
        F.posexplode("refs").alias("pos", "ref"),
    )
    build = staged_nodes(nodes)
    j = exploded.join(build, exploded.ref == build.id, "inner").select(
        "way_id", "_li", "n_refs", "pos", "lon", "lat"
    )
    # force the join shuffle end-to-end without an agg shuffle
    j.agg(F.expr("bit_xor(xxhash64(way_id, pos))")).collect()

def full():
    assemble_ways(nodes, ways_rep).count()

for name, fn in (("join_only", join_only), ("full", full)):
    fn()  # warmup
    best = None
    for _ in range(3):
        t0 = time.time(); fn(); dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best:.2f}s  (n_ways={n_ways})", flush=True)
spark.stop()
