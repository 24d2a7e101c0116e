"""Table I/O: driver parquet registration + Iceberg-shaped table layer.

The sandbox has no Iceberg runtime jar, so "Iceberg tables" are Parquet
directories plus a self-maintained manifest table (see
``osm2shp_spark.plans.manifest``) with Iceberg-like layout (partition
dirs, snapshot id, per-file row counts / digests). All table I/O goes
through this module so a real Iceberg catalog can be swapped in via
Spark conf (``spark.read.format("iceberg")``) without touching
operators.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Driver-provided relational tables (TESTDATA.md).
DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table (swap point for a real Iceberg catalog)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


#: Tables below this size stay unbalanced. Sized so that NOTHING
#: balances at the driver's measured sf0.1 (largest table 10.8 MB):
#: measured on the frozen bench, view-level balancing there was a net
#: loss — the win cases (knn points, dedup signature stages) are per-
#: row-work-bound, not scan-bound, and get their parallelism from the
#: operator-side ``ensure_min_parallelism`` guard instead; the extra
#: exchange regressed tile_vector_join 0.51->0.75 s and way_assembly
#: 3.14->3.34 s. Above ~32 MB the scan *decode* itself is the
#: single-task bottleneck, which only an input-side respread fixes.
MIN_BALANCE_BYTES = 32 * 1024 * 1024


def _balance_scan(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    min_bytes: int | None = None,
) -> DataFrame:
    """Give a fact-table view real scan-stage parallelism.

    The driver parquet files are written as ONE row group each, and a
    Parquet scan cannot split below row-group granularity — so every
    expression/partial-aggregate fused into a scan stage runs on one
    core regardless of cluster width (measured: way_assembly's map
    stage 2.8 s CPU in 1 of 32 slots). A round-robin
    ``repartition(defaultParallelism)`` right after the read spreads
    that work; the exchange moves only the table's raw bytes once.

    Scale-adaptive by construction: when the scan already yields at
    least ``defaultParallelism`` splits (any real multi-row-group /
    multi-file table, i.e. every production layout), this is the
    identity — no exchange is added at 100 TB. Guarded further by
    :data:`MIN_BALANCE_BYTES` so dimension tables skip it, and by a
    try/except so Spark Connect sessions (no RDD access) fall back to
    the raw scan.
    """
    if _input_bytes(path) < (
        MIN_BALANCE_BYTES if min_bytes is None else min_bytes
    ):
        return df
    try:
        parts = df.rdd.getNumPartitions()
        cores = spark.sparkContext.defaultParallelism
    except Exception:
        return df
    if parts >= cores:
        return df
    return df.repartition(cores)


def _input_bytes(path: str) -> int:
    """Size of a parquet file, or the files of a parquet directory."""
    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
        return total
    return os.path.getsize(path)


#: sf_dir whose views are CURRENTLY registered, per session — temp
#: views are session-GLOBAL name slots, so the memo must track what
#: the names point at right now (a seen-pairs set would skip the
#: re-registration needed after another sf_dir overwrote the views).
#: Every synthetic_* helper calls register_driver_tables, so without
#: this each gate query pays ~10 redundant parquet footer reads +
#: view creates.
_CURRENT_SF: dict[object, str] = {}


def register_driver_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register all driver parquet files as temp views (idempotent;
    skipped when this session's views already point at ``sf_dir``).

    Mirrors the DuckDB oracle environment, where the same names are
    pre-registered views — shared SQL text then runs on both engines.
    A missing driver table raises HERE with its name, not later as an
    unrelated TABLE_OR_VIEW_NOT_FOUND inside some query's analysis.
    """
    # applicationId is unique per context (a recycled Python object id
    # after a session restart is not); under Connect use the client's
    # stable session id rather than id(spark) — a GC'd session's
    # recycled object id could alias a new one (r6, ADVICE r5)
    try:
        sid = spark.sparkContext.applicationId
    except Exception:
        sid = getattr(
            getattr(spark, "client", None), "_session_id", None
        ) or id(spark)
    if _CURRENT_SF.get(sid) == sf_dir:
        # don't trust the memo unconditionally: a caller may have
        # dropped/replaced a temp view by name within the session —
        # one driver-side catalog probe validates it (r6, ADVICE r5)
        try:
            if spark.catalog.tableExists(DRIVER_TABLES[0]):
                return
        except Exception:
            pass
        _CURRENT_SF.pop(sid, None)
    for name in DRIVER_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            raise FileNotFoundError(f"driver table missing: {path}")
        df = read_table(spark, sf_dir, name)
        _balance_scan(spark, df, path).createOrReplaceTempView(name)
    _CURRENT_SF[sid] = sf_dir


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite") -> None:
    """Layer-partitioned Parquet write (the reference's one-file-per-layer
    sink, osm/shapefile.cc:9-13, as partition directories)."""
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
