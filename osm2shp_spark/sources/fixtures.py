"""Deterministic binary-image fixture table (FIXTURES.md T3).

Generates the graft-cell input table with the exact input_hint schema
(image_id, bytes, w, h, fmt, caption, phash) plus georeference
(lon, lat) — seeded gradient+noise pixels, PPM/PNG encoded in-process,
phash computed by the generator so the engine must *reproduce* it.
No external data; row count scales with the requested size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from osm2shp_spark.functions import image as I

SEED = 42

_ADJ = ("red", "blue", "tall", "müde", "古老", "quiet", "vast", "étroit")
_NOUN = ("bridge", "harbor", "forest", "straße", "山口", "square", "tower")
_LAYER = ("water_area", "roadbig_line", "city_point", "railway_line")

IMAGE_SCHEMA = (
    "image_id STRING, bytes BINARY, w INT, h INT, fmt STRING, "
    "caption STRING, phash BIGINT, lon DOUBLE, lat DOUBLE"
)


def make_image(idx: int) -> np.ndarray:
    rng = np.random.default_rng(SEED + idx)
    w = int(rng.integers(16, 65))
    h = int(rng.integers(16, 65))
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128.0
        + 100.0 * np.sin(xx / w * np.pi * (1 + idx % 3))
        + 60.0 * np.cos(yy / h * np.pi * (1 + idx % 5))
    )
    arr = np.stack(
        [
            np.clip(base + rng.normal(0, 12, (h, w)) + 30 * (c - 1), 0, 255)
            for c in range(3)
        ],
        axis=2,
    ).astype(np.uint8)
    return arr


def generate_images_pdf(n: int) -> pd.DataFrame:
    return _images_pdf_for_indices(range(n))


def _images_pdf_for_indices(indices) -> pd.DataFrame:
    """Fixture rows for an arbitrary index set — every row is a pure
    function of its index (per-index seeded RNGs), so driver-side and
    distributed generation produce byte-identical rows."""
    rows = []
    for i in indices:
        arr = make_image(i)
        h, w, _ = arr.shape
        fmt = ("ppm", "png", "dcx")[i % 3]
        data = I.encode_image(arr, fmt)
        if fmt in I.LOSSY_FMTS:
            # the stored per-row invariants (phash, and what decode
            # must reproduce) are defined on the DECODED pixels — the
            # only pixels any consumer of the bytes can ever see
            arr = I.decode_image(data, fmt)
        rng = np.random.default_rng(SEED * 7 + i)
        caption = (
            f"{_ADJ[i % len(_ADJ)]} {_NOUN[(i * 3) % len(_NOUN)]} near "
            f"{_LAYER[i % len(_LAYER)]}"
        )
        # ~10% land in the hot cluster (skew fixture, mirrors nodes)
        if i % 10 == 0:
            lon = 8.5 + rng.uniform(0, 0.01)
            lat = 47.5 + rng.uniform(0, 0.01)
        else:
            lon = float(rng.uniform(8.0, 9.0))
            lat = float(rng.uniform(47.0, 48.0))
        rows.append(
            {
                "image_id": f"img-{i:08d}",
                "bytes": data,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": caption,
                "phash": I.average_phash(arr),
                "lon": lon,
                "lat": lat,
            }
        )
    return pd.DataFrame(rows)


def image_table(spark: SparkSession, n: int = 200) -> DataFrame:
    """Distributed fixture generation: encode/phash each image on the
    executor that owns its index instead of single-threaded on the
    driver (guide §5 — the driver should do almost no data work;
    measured 1.5 s of the 2.2 s image_decode_stats wall at n=1200).
    Rows are pure functions of the index, so the table is identical to
    the driver-side ``generate_images_pdf`` (pytest-asserted)."""
    try:
        parallelism = spark.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no sparkContext; modest default
        parallelism = 8
    n_parts = max(1, min(n, parallelism))

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield _images_pdf_for_indices(pdf["id"].tolist())

    return spark.range(0, n, 1, n_parts).mapInPandas(gen, IMAGE_SCHEMA)


def images_count_for_sf(sf_dir: str) -> int:
    """Deterministic fixture size per driver scale factor."""
    if "0.001" in sf_dir:
        return 120
    if "0.01" in sf_dir:
        return 400
    return 1200


def generate_audio_pdf(n: int) -> pd.DataFrame:
    """Deterministic synthesized WAV/PCM16 clip table (sine + seeded
    noise) — shared by the gate query and its golden oracle."""
    from osm2shp_spark.operators.multimodal import encode_wav

    rows = []
    for i in range(n):
        rng = np.random.default_rng(500 + i)
        t = np.arange(1600 + 80 * (i % 20)) / 16000.0
        s = 0.5 * np.sin(
            2 * np.pi * (200 + 5 * i) * t
        ) + 0.05 * rng.standard_normal(len(t))
        rows.append({"audio_id": f"a-{i:05d}", "bytes": encode_wav(s)})
    return pd.DataFrame(rows)


def generate_videos_pdf(n: int = 20) -> pd.DataFrame:
    """Deterministic rawgrid-codec video table (video i has 4 + i%4
    frames of seeded gradient images) — shared by the gate query and
    its golden oracle."""
    from osm2shp_spark.operators.multimodal import encode_rawgrid_video

    rows = []
    for i in range(n):
        frames = [make_image(i * 16 + j) for j in range(4 + i % 4)]
        rows.append(
            {
                "video_id": f"v-{i:05d}",
                "bytes": encode_rawgrid_video(frames),
                "fmt": "rawgrid",
            }
        )
    return pd.DataFrame(rows)
