"""Round-5 prep: decompose the headline knn_places (local[32], sf0.1,
AQE broadcasts the feature side). Stages measured cumulatively:

  topk      : candidates + row_number window + per-point summary
              (up to and including the localCheckpoint)
  solved    : + resolved filter + explode
  full      : + anti-join, broadcast brute fallback, union (shipped)

Experiment only -- measured code untouched."""
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

spark = bench._spark("local[32]", "knn_local_split")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"
k = 3

imgs = synthetic_images(spark, sf_dir).select("image_id", "lon", "lat")
places = classify_nodes(synthetic_nodes(spark, sf_dir)).select(
    "node_id", "lon", "lat"
)

def build_topk():
    feats = (
        with_tiles(places, tile_size=TILE_SIZE)
        .withColumn("_dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .withColumn("_dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .select(
            F.col("node_id").alias("_fid"),
            F.col("lon").alias("_flon"),
            F.col("lat").alias("_flat"),
            (F.col("tile_x") + F.col("_dx")).alias("tile_x"),
            (F.col("tile_y") + F.col("_dy")).alias("tile_y"),
        )
    )
    pts = with_tiles(imgs, tile_size=TILE_SIZE).select(
        F.col("image_id").alias("_pid"),
        F.col("lon").alias("_plon"),
        F.col("lat").alias("_plat"),
        "tile_x", "tile_y",
    )
    d2 = dist2_expr("_plon", "_plat", "_flon", "_flat")
    cand = pts.join(feats, ["tile_x", "tile_y"], "inner").select(
        "_pid", "_plon", "_plat", "_fid", F.expr(d2).alias("dist2")
    )
    w = Window.partitionBy("_pid").orderBy(F.col("dist2").asc(),
                                           F.col("_fid").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .groupBy("_pid")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.max("dist2").alias("_maxd"),
            F.collect_list(F.struct("rank", "_fid", "dist2")).alias("_hits"),
        )
        .localCheckpoint()
    )

rho2 = (TILE_SIZE * COS_REF) ** 2

def t_topk():
    build_topk().count()

def t_solved():
    topk = build_topk()
    resolved = topk.filter((F.col("_n") >= k) & (F.col("_maxd") <= F.lit(rho2)))
    resolved.select("_pid", F.explode("_hits")).count()

def t_full():
    knn_join(imgs, places, k=k).count()

for name, fn in (("topk", t_topk), ("solved", t_solved), ("full", t_full)):
    fn()
    best = None
    for _ in range(3):
        t0 = time.time(); fn(); dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best:.2f}s", flush=True)
spark.stop()
