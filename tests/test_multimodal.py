"""Multimodal column plumbing: WAV round-trip + features, block-mean
resize, video frame fan-out (rawgrid fixture codec), stub gates."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osm2shp_spark.functions import image as I
from osm2shp_spark.operators import multimodal as M
from osm2shp_spark.sources.fixtures import image_table, make_image


def _wav_table(spark, n=20):
    rows = []
    for i in range(n):
        rng = np.random.default_rng(100 + i)
        t = np.arange(1600 + 160 * i) / 16000.0
        s = 0.5 * np.sin(2 * np.pi * (220 + 10 * i) * t) + 0.05 * rng.standard_normal(len(t))
        rows.append({"audio_id": f"a-{i:04d}", "bytes": M.encode_wav(s)})
    return spark.createDataFrame(pd.DataFrame(rows), "audio_id STRING, bytes BINARY")


def _video_table(spark, n=6):
    rows = []
    for i in range(n):
        frames = [make_image(i * 10 + j) for j in range(4 + i % 3)]
        # rawgrid frames must share dims per frame record — they can
        # differ per frame; keep as generated
        rows.append(
            {
                "video_id": f"v-{i:04d}",
                "bytes": M.encode_rawgrid_video(frames),
                "fmt": "rawgrid",
                "n_frames": len(frames),
            }
        )
    return spark.createDataFrame(
        pd.DataFrame(rows), "video_id STRING, bytes BINARY, fmt STRING, n_frames INT"
    )


class TestAudio:
    def test_wav_roundtrip(self):
        t = np.arange(3200) / 16000.0
        s = 0.4 * np.sin(2 * np.pi * 440 * t)
        dec, rate = M.decode_wav(M.encode_wav(s))
        assert rate == 16000
        assert np.abs(dec - s).max() < 1e-3  # 16-bit quantization only

    def test_audio_features(self, spark):
        df = M.audio_features(_wav_table(spark)).toPandas()
        assert len(df) == 20
        assert (df.duration_s > 0).all()
        assert (df.rms > 0.1).all() and (df.rms < 1.0).all()
        assert (df.zero_crossings > 0).all()


class TestResize:
    def test_resize_shapes_and_determinism(self, spark):
        out = M.resize_images(image_table(spark, 12), 8, 8).toPandas()
        assert (out.out_w == 8).all()
        for _, r in out.iterrows():
            arr = I.decode_image(r.bytes, r.fmt)
            assert arr.shape == (8, 8, 3)
        out2 = M.resize_images(image_table(spark, 12), 8, 8).toPandas()
        assert list(out.bytes) == list(out2.bytes)


class TestVideo:
    def test_frame_fanout_counts(self, spark):
        vids = _video_table(spark)
        out = M.sample_video_frames(vids, every_nth=2).toPandas()
        want = sum(
            (r.n_frames + 1) // 2 for r in vids.select("n_frames").collect()
        )
        assert len(out) == want
        assert (out.frame_idx % 2 == 0).all()

    def test_real_codec_is_gated(self):
        with pytest.raises(NotImplementedError):
            M.decode_video_frames(b"xxxx", "h264")

    def test_frame_fanout_matches_closed_form_sql(self, spark):
        """The fan-out's (video_id, frame_idx) rows vs the independent
        closed-form DuckDB twin — the former registered
        ``video_frame_fanout`` gate row, kept here after the registry
        consolidated it into ``video_frame_sample`` (it is a pure
        projection of that gated query)."""
        import duckdb

        from parity import assert_parity

        from osm2shp_spark import queries as Q

        con = duckdb.connect()
        exp = con.execute(Q._VIDEO_FANOUT_ORACLE).df()
        assert_parity(
            Q.q_video_frame_fanout(spark, "/root/testdata/sf0.001"),
            exp,
            "video_frame_fanout",
        )
