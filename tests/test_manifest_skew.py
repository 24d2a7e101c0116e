"""Lineage manifest resumability (kill/restart) + skew operator
equivalence tests."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from conftest import SF_SMALL
from parity import canon_rows

from osm2shp_spark.operators.assemble import assemble_ways
from osm2shp_spark.operators.skew import (
    adaptive_cells,
    assemble_ways_salted,
    cell_histogram,
)
from osm2shp_spark.plans.manifest import Manifest, partition_lineage, run_stage_resumable
from osm2shp_spark.sources.synthetic import (
    synthetic_images,
    synthetic_nodes,
    synthetic_ways,
)


def test_salted_assembly_equivalent(spark):
    nodes = synthetic_nodes(spark, SF_SMALL)
    ways = synthetic_ways(spark, SF_SMALL)
    a = assemble_ways(nodes, ways).toPandas()
    b = assemble_ways_salted(nodes, ways, chunk=3).toPandas()  # tiny chunk → many salts
    assert canon_rows(a) == canon_rows(b)


def test_adaptive_cells_split_hot_only(spark):
    imgs = synthetic_images(spark, SF_SMALL)
    out = adaptive_cells(imgs, base_res=5, hot_threshold=50, max_extra_levels=2)
    pdf = out.toPandas()
    # hot cluster (lon ~8.5, lat ~47.5) should refine; sparse cells stay
    assert (pdf.cell_res > 5).any()
    assert (pdf.cell_res == 5).any()
    # no refined cell may still exceed the threshold at its final level
    # unless it exhausted max_extra_levels
    hist = pdf.groupby(["cell_adaptive", "cell_res"]).size()
    over = hist[hist > 50]
    assert all(res == 7 for (_, res) in over.index)


def test_adaptive_cells_gate_exercises_both_reindex_levels(spark):
    """The registered adaptive_cells gate query (sf0.01, base_res=7,
    threshold=20) must actually take the hot-cell re-index branch at
    BOTH extra levels — res 8 (first split) and res 9 (re-split of a
    still-hot cell) — otherwise the gate row only evidences the cold
    path."""
    from conftest import SF_MED

    from osm2shp_spark import queries as Q

    pdf = Q.q_adaptive_cells(spark, SF_MED).toPandas()
    assert set(pdf.cell_res.unique()) == {7, 8, 9}


def test_lineage_digest_order_insensitive(spark):
    df = synthetic_images(spark, SF_SMALL).select("img_key", "image_id", "lon", "lat")
    part = df.withColumn("part_key", F.col("img_key") % 7)
    a = partition_lineage(part, "s1", "part_key", snapshot_id="x").toPandas()
    b = partition_lineage(
        part.orderBy(F.rand(seed=3)).repartition(17), "s1", "part_key", snapshot_id="x"
    ).toPandas()
    ka = a.sort_values("part_key")[["part_key", "row_count", "digest"]]
    kb = b.sort_values("part_key")[["part_key", "row_count", "digest"]]
    assert ka.values.tolist() == kb.values.tolist()


def test_resume_skips_completed_partitions(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    man_dir = str(tmp_path / "manifest")
    df = (
        synthetic_images(spark, SF_SMALL)
        .select("img_key", "image_id", "lon", "lat")
        .withColumn("part_key", F.col("img_key") % 5)
    )

    def xform(d):
        return d.withColumn("lon2", F.col("lon") * 2)

    # first run: only partitions 0-2 (simulated partial run then crash)
    first = df.filter(F.col("part_key") <= 2)
    r1 = run_stage_resumable(spark, first, "double", "part_key", xform, out_dir, man_dir)
    assert r1.count() == first.count()

    # restart over the FULL input: only partitions 3-4 must process
    r2 = run_stage_resumable(spark, df, "double", "part_key", xform, out_dir, man_dir)
    got_keys = {r.part_key for r in r2.select("part_key").distinct().collect()}
    assert got_keys == {3, 4}

    # final output is complete and byte-identical to a clean one-shot run
    final = spark.read.parquet(out_dir)
    assert final.count() == df.count()
    clean = xform(df)
    assert canon_rows(final.toPandas()) == canon_rows(clean.toPandas())

    # third run: nothing pending
    m = Manifest(spark, man_dir)
    assert m.pending(df, "double", "part_key").count() == 0


def test_cell_histogram_sums_to_total(spark):
    imgs = synthetic_images(spark, SF_SMALL)
    from osm2shp_spark.functions.udfs import hex_cell_udf

    pts = imgs.withColumn("c", hex_cell_udf(7)(F.col("lon"), F.col("lat")))
    h = cell_histogram(pts, "c").toPandas()
    assert h.n.sum() == imgs.count()


def test_resume_heals_unrecorded_partitions_without_duplicates(spark, tmp_path):
    """Crash window between data append and manifest append: the data
    for a partition is fully committed but unrecorded. The resume must
    record its lineage from disk and NOT re-append its rows."""
    out_dir = str(tmp_path / "out")
    man_dir = str(tmp_path / "manifest")
    df = (
        synthetic_images(spark, SF_SMALL)
        .select("img_key", "image_id", "lon", "lat")
        .withColumn("part_key", F.col("img_key") % 5)
    )

    def xform(d):
        return d.withColumn("lon2", F.col("lon") * 2)

    run_stage_resumable(spark, df, "heal", "part_key", xform, out_dir, man_dir)
    n = spark.read.parquet(out_dir).count()
    # simulate the crash window: data committed, manifest rows lost
    import shutil

    shutil.rmtree(man_dir)
    r2 = run_stage_resumable(spark, df, "heal", "part_key", xform, out_dir, man_dir)
    assert r2.count() == 0  # nothing reprocessed
    assert spark.read.parquet(out_dir).count() == n  # no duplicate rows
    m = Manifest(spark, man_dir)
    assert m.pending(df, "heal", "part_key").count() == 0  # manifest healed
