import os, sys, time
os.chdir("/root/repo"); sys.path.insert(0, "/root/repo")
import bench
from pyspark.sql import functions as F
from osm2shp_spark.functions.udfs import with_point_cells
from osm2shp_spark.sources.synthetic import synthetic_images

spark = bench._spark_isolated(8, "arrow_sweep8")
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"
R = 128
base = (
    synthetic_images(spark, sf_dir)
    .select("img_key", "lon", "lat")
    .select("*", F.explode(F.sequence(F.lit(1), F.lit(R))).alias("rep"))
    .withColumn("img_key", F.col("img_key") * R + F.col("rep"))
    .drop("rep")
)

def mat(df):
    out = with_point_cells(df)
    cols = [c for c in out.columns if c.startswith(("s2_", "hex_"))]
    out.agg(F.expr(f"bit_xor(xxhash64({','.join(cols)}))")).collect()

for width in (32, 8):
    pts = base.repartition(width).cache()
    n = pts.count()
    for batch in (10000, 50000):
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
        mat(pts.limit(64)); mat(pts)
        best = None
        for _ in range(3):
            t0 = time.time(); mat(pts); dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"width={width:4d} batch={batch:7d} best={best:6.2f}s n={n}", flush=True)
    pts.unpersist()
spark.stop()
