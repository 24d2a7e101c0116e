"""Round-5 prep: can the kNN top-k window reuse the tile join's
exchange?

After `pts JOIN feats ON (tile_x, tile_y)`, every point's complete
candidate set is co-located (a point appears once, in its own tile's
partition). HashPartitioning(tile_x, tile_y) satisfies
ClusteredDistribution([tile_x, tile_y, _pid]) — its expressions are a
subset — so a window over partitionBy(tile_x, tile_y, _pid) needs NO
new exchange, only a within-partition sort, and row_number per
(tile, pid) == per pid because pid determines its tile. The shipped
operator windows over _pid alone, which re-shuffles the full
candidate set.

Measures shipped knn_join vs the exchange-reuse variant on the
headline knn_places input (sf0.1), local[32] like the headline run.
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

spark = bench._spark("local[32]", "knn_window_reuse")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"
k = 3

imgs = synthetic_images(spark, sf_dir).select("image_id", "lon", "lat")
places = classify_nodes(synthetic_nodes(spark, sf_dir)).select(
    "node_id", "lon", "lat"
)

def variant(points, features, point_id="image_id", feature_id="node_id",
            tile_size=TILE_SIZE):
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
        "tile_x",
        "tile_y",
    )
    d2 = dist2_expr("_plon", "_plat", "_flon", "_flat")
    # keep the tile keys on the candidate rows: the window below
    # clusters on a superset of the join keys -> exchange reuse
    cand = pts.join(feats, ["tile_x", "tile_y"], "inner").select(
        "tile_x", "tile_y", "_pid", "_plon", "_plat", "_fid",
        F.expr(d2).alias("dist2"),
    )
    w = (Window.partitionBy("tile_x", "tile_y", "_pid")
         .orderBy(F.col("dist2").asc(), F.col("_fid").asc()))
    topk = (
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
    rho2 = (tile_size * COS_REF) ** 2
    resolved = topk.filter((F.col("_n") >= k) & (F.col("_maxd") <= F.lit(rho2)))
    solved = resolved.select("_pid", F.explode("_hits").alias("h")).select(
        F.col("_pid").alias(point_id),
        F.col("h.rank").alias("rank"),
        F.col("h._fid").alias(feature_id),
        F.col("h.dist2").alias("dist2"),
    )
    unresolved = pts.join(
        resolved.select("_pid"), "_pid", "left_anti"
    ).select("_pid", "_plon", "_plat")
    allfeats = features.select(
        F.col(feature_id).alias("_fid"),
        F.col("lon").alias("_flon"),
        F.col("lat").alias("_flat"),
    )
    wb = Window.partitionBy("_pid").orderBy(
        F.col("dist2").asc(), F.col("_fid").asc()
    )
    brute = (
        unresolved.crossJoin(F.broadcast(allfeats))
        .select("_pid", "_fid", F.expr(d2).alias("dist2"))
        .withColumn("rank", F.row_number().over(wb))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_pid").alias(point_id), "rank",
            F.col("_fid").alias(feature_id), "dist2",
        )
    )
    return solved.unionByName(brute)

def shipped():
    return knn_join(imgs, places, k=k).count()

def reuse():
    return variant(imgs, places).count()

# correctness first: bit-identical result sets
a = knn_join(imgs, places, k=k)
b = variant(imgs, places)
na, nb = a.count(), b.count()
diff = a.exceptAll(b).count() + b.exceptAll(a).count()
print(f"rows shipped={na} reuse={nb} symdiff={diff}", flush=True)

# does the variant actually skip the exchange?
plan = b._jdf.queryExecution().executedPlan().toString()
print("exchanges_in_reuse_plan:", plan.count("Exchange"), flush=True)
ap = a._jdf.queryExecution().executedPlan().toString()
print("exchanges_in_shipped_plan:", ap.count("Exchange"), flush=True)

for name, fn in (("shipped", shipped), ("reuse", reuse)):
    fn()
    best = None
    for _ in range(3):
        t0 = time.time(); fn(); dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best:.2f}s", flush=True)
spark.stop()
