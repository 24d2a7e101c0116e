#!/usr/bin/env python
"""r6: isolate the knn_places physical strategies in ONE process.

Times, with noop sink + cache cleared between repeats (bench.py's
estimator), at sf0.1 local[32]:

- shuffle: knn_join (the r5 declared-query path)
- broadcast: knn_join_broadcast (numpy tile buckets, zero shuffle)
- auto: knn_join_auto (count pre-pass + selector)

Run several times in fresh processes to probe the driver-observed
bimodality (BENCH_r05.json: per-process best-of-3 = 4.0s vs ~12s).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from osm2shp_spark.operators.classify import classify_nodes
    from osm2shp_spark.operators.spatial import (
        knn_join,
        knn_join_auto,
        knn_join_broadcast,
    )
    from osm2shp_spark.session import get_spark
    from osm2shp_spark.sources.synthetic import synthetic_images, synthetic_nodes

    spark = get_spark(
        app_name="knn_r06", master=f"local[{cpus}]",
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )

    def build(variant):
        imgs = synthetic_images(spark, sf_dir).select("image_id", "lon", "lat")
        places = classify_nodes(synthetic_nodes(spark, sf_dir)).select(
            "node_id", "lon", "lat"
        )
        if variant == "shuffle":
            return knn_join(imgs, places, k=3)
        if variant == "broadcast":
            return knn_join_broadcast(imgs, places, k=3)
        return knn_join_auto(imgs, places, k=3)

    out = {}
    for variant in ("shuffle", "broadcast", "auto"):
        samples = []
        for _ in range(3):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"knn r06 {variant}")
            t0 = time.time()
            build(variant).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out[variant] = samples
        print(f"{variant}: {samples}", flush=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
