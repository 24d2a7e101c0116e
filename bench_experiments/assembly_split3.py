"""Round-5 prep, part 3: the raw shuffle-2 exchange floor.

  exchange_floor : join output repartitioned by way_id -> noop sink
                   (the bytes-through-the-wire cost, no aggregation)
  full           : the shipped operator

If exchange_floor ~= (full - join_only), the groupBy machinery is
free and the only shuffle-2 lever is fewer bytes per ref (packed runs
/ narrower pos). Experiment only."""
import os, sys, time
os.chdir("/root/repo"); sys.path.insert(0, "/root/repo")
import bench
from pyspark.sql import functions as F
from osm2shp_spark.operators.assemble import assemble_ways
from osm2shp_spark.operators.classify import classify_ways, staged_nodes
from osm2shp_spark.rules import way_pair_idx_sql
from osm2shp_spark.sources.synthetic import synthetic_nodes, synthetic_ways

spark = bench._spark_isolated(32, "assembly_split3")
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
ways_rep.count()

def joined():
    classified = classify_ways(ways_rep)
    exploded = classified.select(
        F.col("id").alias("way_id"),
        F.expr(way_pair_idx_sql()).alias("_li"),
        "n_refs",
        F.posexplode("refs").alias("pos", "ref"),
    )
    build = staged_nodes(nodes)
    return exploded.join(build, exploded.ref == build.id, "inner").select(
        "way_id", "_li", "n_refs", "pos", "lon", "lat"
    )

def exchange_floor():
    (joined().repartition(128, "way_id")
     .write.format("noop").mode("overwrite").save())

def full():
    assemble_ways(nodes, ways_rep).count()

for name, fn in (("exchange_floor", exchange_floor), ("full", full)):
    fn()
    best = None
    for _ in range(3):
        t0 = time.time(); fn(); dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best:.2f}s", flush=True)
spark.stop()
