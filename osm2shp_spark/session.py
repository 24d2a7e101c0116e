"""SparkSession factory with the engine's scale-oriented defaults.

Local-mode testing uses ``local[N]``; on a real cluster the same confs
apply (AQE, skew-join, Arrow). Tests call :func:`get_spark` once per
session (pytest fixture scope=session).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    # AQE: runtime re-plan, partition coalescing, skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Shuffle width sized to local cores; a cluster deployment overrides
    # via spark-submit --conf (rule of thumb: 2-3x total cores).
    "spark.sql.shuffle.partitions": "32",
    # Arrow transfer for pandas UDFs / toPandas (the only Python paths).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Batch sizing, measured (bench_experiments/arrow_sweep_{32c,8c}):
    # on the vectorized cell-index stage 50k-row batches beat the 10k
    # default 1.3-1.9x at every fleet size/width (per-batch UDF setup
    # amortizes); >=200k regresses (allocator pressure). Rows are the
    # wrong cap for binary-heavy stages (50k x 1 MB images), so the
    # byte cap below bounds mapInPandas batches at 128 MB regardless.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "50000",
    "spark.sql.execution.arrow.maxBytesPerBatch": str(128 * 1024 * 1024),
    # Object-aggregate (collect_list/collect_set) hash-map size before
    # the per-task sort fallback. The 128-key Spark default exists
    # because object buffers are opaque to the memory manager, but it
    # makes every grouped-collect stage (kNN top-k, way assembly) sort
    # its FULL input per task — the exact row sort the aggregate
    # rewrite removed (measured: knn_places execution 2 in a fresh JVM
    # 10.7s -> 4.4s, way_assembly cold 11.5s -> 5.0s; steady state
    # equal or better). 8192 keys covers the engine's per-task group
    # counts at 2-3x-cores shuffle width (hundreds to ~5k groups/task
    # across the gated + benched workloads) while bounding worst-case
    # UNTRACKED buffer memory by the largest group this engine builds:
    # a max-size OSM way (2000 refs x ~24 B struct ~ 48 KB) gives
    # 8192 x 48 KB ~ 384 MB/task at the adversarial
    # every-group-maximal extreme, vs multi-GB at 64k keys. Beyond
    # 8192 in-memory groups the sort fallback engages — the
    # memory-safe behavior wanted at that cardinality anyway.
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": "8192",
    # Deterministic timestamps vs the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Broadcast policy: node build sides at sandbox scale always fit;
    # AQE converts to broadcast at runtime when stats allow anyway.
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "48g",
}


def get_spark(
    app_name: str = "osm2shp_spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    Pass e.g. ``local[8]`` explicitly for scaling-efficiency runs.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(DEFAULT_CONFS)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
