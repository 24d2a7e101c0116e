"""Round-4 check: the v4 weak study's 8-executor way_assembly minimum
(6.97 s) doubled vs the v3-host reading (3.43 s). Isolate the stage at
the weak 8-exec level (R=128, 32 cores, local-cluster[8,4]) and sweep
the two candidate causes:

  smallint  - compact_pos=True  (the v4 lever, shipped)
  int       - compact_pos=False (the v3 behavior)
  zstd      - compact_pos=True + zstd shuffle compression (candidate
              lever: the stage is exchange-bandwidth bound per the
              assembly_split decomposition, so a denser wire format
              may buy what narrower ints did)

Experiment only -- measured code untouched.  Run AFTER the recorded
studies finish (quiet box), min-of-3 per config.
"""
import os, sys, time

os.chdir("/root/repo"); sys.path.insert(0, "/root/repo")
import bench
from pyspark.sql import functions as F
from osm2shp_spark.operators.assemble import assemble_ways
from osm2shp_spark.sources.synthetic import synthetic_nodes, synthetic_ways

CODEC = sys.argv[1] if len(sys.argv) > 1 else "lz4"

spark = bench._spark_isolated(32, f"assembly_weak8x_{CODEC}",
                              extra={"spark.io.compression.codec": CODEC})
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

for name, compact in (("smallint", True), ("int", False)):
    fn = lambda: assemble_ways(nodes, ways_rep, compact_pos=compact).count()
    fn()  # warmup
    best = None
    for _ in range(3):
        t0 = time.time(); fn(); dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"[assembly_weak8x codec={CODEC}] {name}: {best:.2f}s", flush=True)
spark.stop()
