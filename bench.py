#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling evidence).

Default: run the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and print ONE
JSON line::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...}, "sf": ...}

``--scaling``: additionally run the flagship spatial pipeline at two
parallelism levels (local[8] vs local[32]) on identical input — the
sandbox stand-in for the north rule's N vs 4N executors — and write
throughput + scaling efficiency to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "way_assembly",
    "node_export",
    "pip_rect",
    "knn_places",
    "tile_vector_join",
    "exact_dedup",
    "minhash_near_dups",
    "ann_cosine_topk",
    "pricing_summary",
    "image_decode_stats",
]


def _spark(master: str, app: str):
    from osm2shp_spark.session import get_spark

    return get_spark(
        app_name=app,
        master=master,
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )


def _materialize(df) -> int:
    """Run the full plan through the noop sink; return row count cheaply
    via the same pass? noop discards counts, so count() a cached plan is
    paid twice — instead count once (forces full compute for non-scan
    plans)."""
    return df.count()


def run_headline(sf_dir: str, master: str) -> dict:
    from osm2shp_spark import queries as Q

    spark = _spark(master, "bench_headline")
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in HEADLINE:
        fn, _ = Q.REGISTRY[name]
        t0 = time.time()
        rows[name] = _materialize(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
    spark.stop()
    return {"timings": timings, "rows": rows}


def flagship_job(spark, sf_dir: str, replicate: int = 4) -> int:
    """The scaling workload: way assembly + cell indexing + PIP classify
    over input replicated ``replicate``x (deterministic), so compute
    dominates fixed overheads. Returns rows processed (throughput
    numerator)."""
    from pyspark.sql import functions as F

    from osm2shp_spark.functions.udfs import with_point_cells
    from osm2shp_spark.operators.assemble import assemble_ways
    from osm2shp_spark.operators.spatial import pip_join
    from osm2shp_spark.sources.synthetic import (
        synthetic_images,
        synthetic_nodes,
        synthetic_rects,
        synthetic_ways,
    )

    nodes = synthetic_nodes(spark, sf_dir)
    ways = synthetic_ways(spark, sf_dir)
    rep = F.explode(F.sequence(F.lit(1), F.lit(replicate))).alias("rep")
    ways_rep = ways.select("*", rep).withColumn(
        "id", F.col("id") * replicate + F.col("rep")
    ).drop("rep")
    assembled = assemble_ways(nodes, ways_rep)

    imgs = synthetic_images(spark, sf_dir).select("image_id", "lon", "lat")
    imgs_rep = (
        imgs.select("*", rep)
        .withColumn("image_id", F.concat_ws("#", "image_id", "rep"))
        .drop("rep")
    )
    indexed = with_point_cells(imgs_rep, s2_level=12, hex_resolutions=(7, 9, 12))
    rects = synthetic_rects(spark, sf_dir).select(
        "rect_id",
        "layer",
        F.array("lon_min", "lon_max", "lon_max", "lon_min", "lon_min").alias("lons"),
        F.array("lat_min", "lat_min", "lat_max", "lat_max", "lat_min").alias("lats"),
    )
    classified = pip_join(
        indexed.select("image_id", "lon", "lat"), rects, ("image_id",), ("rect_id", "layer")
    )
    n = assembled.count() + indexed.count() + classified.count()
    return n


def run_scaling(sf_dir: str, low: int = 8, high: int = 32, replicate: int = 4) -> dict:
    results = {}
    for cores in (low, high):
        spark = _spark(f"local[{cores}]", f"bench_scaling_{cores}")
        t0 = time.time()
        rows = flagship_job(spark, sf_dir, replicate)
        dt = time.time() - t0
        spark.stop()
        results[cores] = {"sec": round(dt, 2), "rows": rows, "rows_per_sec": round(rows / dt, 1)}
    eff = (results[high]["rows_per_sec"] / results[low]["rows_per_sec"]) / (high / low)
    results["efficiency"] = round(eff, 3)
    return results


def write_baseline_md(sf_dir: str, headline: dict, scaling: dict | None) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    lines = [
        "# BENCH/BASELINE.md — measured engine numbers",
        "",
        f"Input: `{sf_dir}` (driver tables + derived geo/image tables).",
        "Reference publishes no benchmark (SURVEY §6); the targets are the",
        "north rule's throughput + ≥0.8 scaling efficiency from N to 4N",
        "parallelism, evidenced here as local[8] vs local[32] on identical",
        "input (no real cluster in-sandbox).",
        "",
        "## Headline query timings",
        "",
        "| query | sec | rows |",
        "|---|---|---|",
    ]
    for name, sec in headline["timings"].items():
        lines.append(f"| {name} | {sec} | {headline['rows'][name]} |")
    if scaling:
        lines += [
            "",
            "## Scaling (same job, same input, two parallelism levels)",
            "",
            "| cores | sec | rows | rows/sec |",
            "|---|---|---|---|",
        ]
        for cores in (8, 32):
            r = scaling[cores]
            lines.append(f"| {cores} | {r['sec']} | {r['rows']} | {r['rows_per_sec']} |")
        lines += [
            "",
            f"**Scaling efficiency (thr32/thr8)/4 = {scaling['efficiency']}**",
            "(north-rule criterion: ≥ 0.8)",
        ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else None

    headline = run_headline(sf_dir, f"local[{cpus}]")
    scaling = None
    if "--scaling" in sys.argv:
        scaling = run_scaling(sf_dir)
    write_baseline_md(sf_dir, headline, scaling)

    out = {
        "metric": "headline_query_wall_sec_total",
        "value": round(sum(headline["timings"].values()), 3),
        "unit": "sec",
        "queries": headline["timings"],
        "sf": sf,
    }
    if scaling:
        out["scaling_efficiency_8_to_32"] = scaling["efficiency"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
