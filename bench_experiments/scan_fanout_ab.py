#!/usr/bin/env python
"""A/B: driver-table views as-is (1 row group => ~1-task scans) vs
balanced with an explicit repartition(defaultParallelism) at
registration. Per query: 3 plain reps then 3 balanced reps; the first
rep of each arm pays the (re-)registration, so compare min of the
last two. Registration memo stays intact within an arm.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import osm2shp_spark.sources.tables as T  # noqa: E402
from osm2shp_spark.session import get_spark  # noqa: E402

QUERIES = [
    "pricing_summary",
    "node_export",
    "exact_dedup",
    "tile_vector_join",
    "ann_cosine_topk",
    "pip_rect",
    "way_assembly",
    "minhash_near_dups",
    "knn_places",
]

MIN_BYTES = 512 * 1024


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="scan_fanout_ab", master=f"local[{cpus}]",
                      extra_confs={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as contract
    qs = contract.queries()

    orig_read = T.read_table

    def balanced_read(spark_, sf_dir, name):
        df = orig_read(spark_, sf_dir, name)
        try:
            parts = df.rdd.getNumPartitions()
            cores = spark_.sparkContext.defaultParallelism
            size = os.path.getsize(os.path.join(sf_dir, f"{name}.parquet"))
            if parts < cores and size >= MIN_BYTES:
                df = df.repartition(cores)
        except Exception:
            pass
        return df

    mode = {"balanced": False}

    def set_mode(balanced: bool):
        if mode["balanced"] == balanced:
            return
        mode["balanced"] = balanced
        T.read_table = balanced_read if balanced else orig_read
        T._CURRENT_SF.clear()

    # global warmup (plain)
    noop(qs["way_assembly"](spark, sf))
    noop(qs["exact_dedup"](spark, sf))

    for name in QUERIES:
        res = {}
        for label, b in (("plain", False), ("balanced", True)):
            set_mode(b)
            ts = []
            for _ in range(3):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{name}:{label}")
                t0 = time.time()
                noop(qs[name](spark, sf))
                ts.append(time.time() - t0)
            res[label] = ts
        p, q = min(res["plain"][1:]), min(res["balanced"][1:])
        print(f"{name:20s} plain={p:6.3f} balanced={q:6.3f}  "
              f"({p/q:4.2f}x)  samples p={[round(x,2) for x in res['plain']]} "
              f"b={[round(x,2) for x in res['balanced']]}")
    T.read_table = orig_read
    spark.stop()


if __name__ == "__main__":
    main()
