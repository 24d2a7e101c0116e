"""applyInPandasWithState sessionizer: closed sessions from the stream
must equal the batch sessionizer's sessions, except those still within
the gap+watermark window of the stream's max event time (the open
tails that a live stream would close later)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMALL

from osm2shp_spark import queries as Q
from osm2shp_spark.sources.tables import register_driver_tables
from osm2shp_spark.streaming.stateful import SESSION_GAP_S, run_sessionize_over_parquet


def test_stream_sessions_match_batch(spark):
    streamed = run_sessionize_over_parquet(
        spark, f"{SF_SMALL}/events.parquet", name="t_sessions"
    ).toPandas()
    batch = Q.q_events_sessionize(spark, SF_SMALL).toPandas()

    register_driver_tables(spark, SF_SMALL)
    max_ts = (
        spark.table("events").agg(F.max(F.unix_timestamp("ts"))).collect()[0][0]
    )

    a = {
        (int(r.user_id), int(r.session_start), int(r.session_end), int(r.n_events))
        for _, r in streamed.iterrows()
    }
    b_all = {
        (int(r.user_id), int(r.session_start), int(r.session_end), int(r.n_events))
        for _, r in batch.iterrows()
    }
    # sessions whose close-timeout is clearly before the final watermark
    # MUST have been emitted; ones near the boundary may or may not
    # (watermark delay + truncation) — allow only that sliver of slack
    margin = 60
    must_close = {
        s for s in b_all if s[2] + SESSION_GAP_S + margin < max_ts
    }
    assert must_close <= a, f"missing {len(must_close - a)} definitely-closed sessions"
    assert a <= b_all, "streamed a session the batch sessionizer doesn't have"


def test_streamed_sessions_internally_consistent(spark):
    streamed = run_sessionize_over_parquet(
        spark, f"{SF_SMALL}/events.parquet", name="t_sessions2"
    ).toPandas()
    assert (streamed.session_start <= streamed.session_end).all()
    assert (streamed.n_events >= 1).all()
    # no two sessions of a user overlap
    for _, g in streamed.groupby("user_id"):
        g = g.sort_values("session_start")
        assert (g.session_start.shift(-1)[:-1] > g.session_end[:-1]).all()
