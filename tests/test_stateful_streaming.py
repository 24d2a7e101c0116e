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


class _FakeState:
    """Minimal GroupState stand-in to drive _sessionize directly."""

    def __init__(self, watermark_ms=0, stored=None, timed_out=False):
        self._wm = watermark_ms
        self._st = stored
        self.hasTimedOut = timed_out
        self.timeout_set = None
        self.removed = False

    @property
    def exists(self):
        return self._st is not None

    @property
    def get(self):
        return self._st

    def update(self, t):
        self._st = tuple(t)

    def remove(self):
        self._st, self.removed = None, True

    def setTimeoutTimestamp(self, ms):
        self.timeout_set = ms

    def getCurrentWatermarkMs(self):
        return self._wm


def _batch(events):
    import pandas as pd

    return iter(
        [
            pd.DataFrame(
                {
                    "ets": [e[0] for e in events],
                    "event_id": [e[1] for e in events],
                    "value": [e[2] for e in events],
                }
            )
        ]
    )


def test_sessionize_late_event_lowers_session_start():
    """An in-watermark event from a later batch that is OLDER than the
    stored session's start must pull session_start down — the batch
    twin sorts globally, so stream/batch parity depends on it."""
    from osm2shp_spark.streaming.stateful import _sessionize

    st = _FakeState(watermark_ms=0)
    list(_sessionize((7,), _batch([(1000, 1, 1.0)]), st))
    assert st.get[:2] == (1000, 1000)
    st2 = _FakeState(watermark_ms=990_000, stored=st.get)
    list(_sessionize((7,), _batch([(995, 2, 2.0)]), st2))
    assert st2.get[:2] == (995, 1000)
    assert st2.get[2] == 2


def test_sessionize_already_expired_session_emits_immediately():
    """When the gap window is already behind the watermark at update
    time (watermark delay > gap configurations), the session must be
    emitted now — a clamped timeout of watermark+1 would never fire if
    the watermark never advances again."""
    from osm2shp_spark.streaming.stateful import SESSION_GAP_S, _sessionize

    wm_ms = (5000 + SESSION_GAP_S + 100) * 1000
    st = _FakeState(watermark_ms=wm_ms)
    out = list(_sessionize((9,), _batch([(5000, 1, 1.0)]), st))
    assert st.removed and st.timeout_set is None
    assert len(out) == 1 and out[0].iloc[0].session_end == 5000
