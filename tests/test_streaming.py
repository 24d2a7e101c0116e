"""Structured Streaming: stream/batch parity + query surface."""

from __future__ import annotations

from conftest import SF_SMALL
from parity import canon_rows

from osm2shp_spark import queries as Q
from osm2shp_spark.sources.tables import register_driver_tables
from osm2shp_spark.streaming.windows import (
    run_stream_over_parquet,
    windowed_agg_batch,
)


def test_stream_equals_batch(spark):
    register_driver_tables(spark, SF_SMALL)
    batch = windowed_agg_batch(spark.table("events")).toPandas()
    streamed = run_stream_over_parquet(
        spark, f"{SF_SMALL}/events.parquet", name="t_stream_out"
    ).toPandas()
    assert canon_rows(batch) == canon_rows(streamed)


def test_sessionize_invariants(spark):
    df = Q.q_events_sessionize(spark, SF_SMALL).toPandas()
    assert (df.session_start <= df.session_end).all()
    assert (df.n_events >= 1).all()
    # session ids start at 1 and are dense per user
    g = df.groupby("user_id").session_id
    assert (g.min() == 1).all()
    assert (g.max() == g.count()).all()
