#!/usr/bin/env python
"""Round-6 optimization measurement harness (guide §1).

Separate from the FROZEN ``bench.py`` driver contract. Per headline
query: noop-sink isolation (times the computation, not the sink —
guide §1.4), per-query best-of-N with cache cleared between repeats
(same steady-state estimator as bench.py), and
``.explain("formatted")`` capture into ``plans/r06/<query>_<tag>.txt``
for the plan-diff evidence the round deliverable requires.

Usage::

    python bench_extra.py [--tag before|after] [--queries a,b,c]
                          [--repeats 3] [--no-plans]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "pricing_summary",
    "node_export",
    "exact_dedup",
    "tile_vector_join",
    "ann_cosine_topk",
    "pip_rect",
    "way_assembly",
    "image_decode_stats",
    "minhash_near_dups",
    "knn_places",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    tag = "before"
    if "--tag" in sys.argv:
        tag = sys.argv[sys.argv.index("--tag") + 1]
    repeats = 3
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])
    names = HEADLINE
    if "--queries" in sys.argv:
        names = sys.argv[sys.argv.index("--queries") + 1].split(",")
    dump_plans = "--no-plans" not in sys.argv

    from osm2shp_spark import queries as Q
    from osm2shp_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{cpus}]",
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    plan_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(plan_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        fn, _ = Q.REGISTRY[name]
        if dump_plans:
            spark.catalog.clearCache()
            df = fn(spark, sf_dir)
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
        samples = []
        for _ in range(repeats):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"r06 {tag}: {name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out[name] = {"best": min(samples), "samples": samples}
        print(f"[{tag}] {name}: best {min(samples)} of {samples}", flush=True)
    spark.stop()
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
