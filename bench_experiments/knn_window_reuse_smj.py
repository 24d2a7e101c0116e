"""Round-5 prep, part 2: the exchange-reuse window under the 100 TB
regime — broadcast disabled so the tile join is a real shuffle join
(sort-merge / shuffled-hash), which is what a planet-scale feature
table would force. Companion to knn_window_reuse.py (which showed the
local sf0.1 plan broadcasts the feature side, so both window specs
shuffle the candidate set identically and no reuse is possible)."""
import os, sys, time
os.chdir("/root/repo"); sys.path.insert(0, "/root/repo")
import bench
from pyspark.sql import functions as F
from pyspark.sql import Window
from osm2shp_spark.operators.classify import classify_nodes
from osm2shp_spark.operators.spatial import (
    COS_REF, TILE_SIZE, dist2_expr, knn_join, with_tiles,
)
from osm2shp_spark.sources.synthetic import synthetic_images, synthetic_nodes

spark = bench._spark("local[32]", "knn_reuse_smj")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"
k = 3

imgs = synthetic_images(spark, sf_dir).select("image_id", "lon", "lat")
places = classify_nodes(synthetic_nodes(spark, sf_dir)).select(
    "node_id", "lon", "lat"
)

def cand_of(points, features, point_id, feature_id, tile_size, keep_tiles):
    feats = (
        with_tiles(features, tile_size=tile_size)
        .withColumn("_dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .withColumn("_dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .select(
            F.col(feature_id).alias("_fid"),
            F.col("lon").alias("_flon"),
            F.col("lat").alias("_flat"),
            (F.col("tile_x") + F.col("_dx")).alias("tile_x"),
            (F.col("tile_y") + F.col("_dy")).alias("tile_y"),
        )
    )
    pts = with_tiles(points, tile_size=tile_size).select(
        F.col(point_id).alias("_pid"),
        F.col("lon").alias("_plon"),
        F.col("lat").alias("_plat"),
        "tile_x", "tile_y",
    )
    d2 = dist2_expr("_plon", "_plat", "_flon", "_flat")
    cols = (["tile_x", "tile_y"] if keep_tiles else []) + [
        "_pid", "_plon", "_plat", "_fid"]
    return pts, pts.join(feats, ["tile_x", "tile_y"], "inner").select(
        *cols, F.expr(d2).alias("dist2"))

def run(keep_tiles):
    pts, cand = cand_of(imgs, places, "image_id", "node_id", TILE_SIZE,
                        keep_tiles)
    spec = (["tile_x", "tile_y", "_pid"] if keep_tiles else ["_pid"])
    w = Window.partitionBy(*spec).orderBy(F.col("dist2").asc(),
                                          F.col("_fid").asc())
    topk = (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .groupBy("_pid")
            .agg(F.count(F.lit(1)).alias("_n")))
    return topk

# plan shape: count the exchanges between the join and the window
for keep in (False, True):
    t = run(keep)
    t.count()
    plan = t._jdf.queryExecution().executedPlan().toString()
    print(f"keep_tiles={keep} exchanges={plan.count('Exchange')}", flush=True)
    best = None
    for _ in range(3):
        t0 = time.time(); run(keep).count(); dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"keep_tiles={keep} best={best:.2f}s", flush=True)
spark.stop()
