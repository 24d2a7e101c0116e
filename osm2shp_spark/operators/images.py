"""Image-pipeline operators (axis B): decode/verify, feature extract,
phash dedup, and the image→spatial bridge. Binary payloads ride as
opaque ``binary`` columns with typed metadata (input_hint schema);
decode/feature steps run in ``mapInPandas`` — Arrow moves the bytes,
NumPy does the pixels, nothing is per-row Python except the inherently
per-image codec loop inside each Arrow batch.

Scale notes: decode parallelism is pure map-side (no shuffle); the
phash-dedup join reuses the SimHash banding trick (pigeonhole on
16-bit bands → 100% recall for hamming ≤ 3) so it shuffles only
16-byte keys, never pixels.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2shp_spark.functions import image as I

DECODE_STATS_SCHEMA = (
    "image_id STRING, fmt STRING, w INT, h INT, decode_ok BOOLEAN, "
    "width_matches BOOLEAN, phash_matches BOOLEAN, mean_px DOUBLE, "
    "psnr DOUBLE, caption STRING"
)


def decode_stats_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Row kernel of :func:`decode_stats` (one Arrow batch in, one
    frame out) — also the golden-oracle generator's single source of
    truth (``osm2shp_spark.golden``)."""
    out = []
    for r in pdf.itertuples(index=False):
        try:
            arr = I.decode_image(r.bytes, r.fmt)
            if r.fmt in I.LOSSLESS_FMTS:
                # round-trip PSNR is identically infinite for a
                # lossless codec — skip the re-encode (halves
                # the codec cost of the biggest map stage)
                p = float("inf")
            else:
                rt = I.decode_image(I.encode_image(arr, r.fmt), r.fmt)
                p = I.psnr(arr, rt)
            out.append(
                (
                    r.image_id,
                    r.fmt,
                    r.w,
                    r.h,
                    True,
                    arr.shape[1] == r.w and arr.shape[0] == r.h,
                    I.average_phash(arr) == r.phash,
                    float(arr.mean()),
                    1e9 if p == float("inf") else p,
                    # caption rides through the decode stage so the
                    # golden oracle value-checks the input_hint's
                    # caption-equality invariant across Arrow both ways
                    r.caption,
                )
            )
        except Exception:
            out.append(
                (r.image_id, r.fmt, r.w, r.h, False, False, False, 0.0, 0.0,
                 r.caption)
            )
    return pd.DataFrame(
        out,
        columns=[
            "image_id", "fmt", "w", "h", "decode_ok",
            "width_matches", "phash_matches", "mean_px", "psnr", "caption",
        ],
    )


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode every image and verify the per-row invariants
    (input_hint): decoded size matches metadata, recomputed phash
    matches the stored one, PSNR vs re-encode round-trip (∞ for the
    lossless formats; the ≥40 dB gate applies when a lossy codec is
    plugged in)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_stats_pdf(pdf)

    return images.mapInPandas(run, schema=DECODE_STATS_SCHEMA)


FEATURES_SCHEMA = (
    "image_id STRING, mean_r DOUBLE, mean_g DOUBLE, mean_b DOUBLE, "
    "contrast DOUBLE, edge_energy DOUBLE, thumb ARRAY<DOUBLE>"
)


def extract_features_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Row kernel of :func:`extract_features` — shared with the
    golden-oracle generator."""
    out = []
    for r in pdf.itertuples(index=False):
        arr = I.decode_image(r.bytes, r.fmt).astype(np.float64)
        gray = arr.mean(axis=2)
        gx = np.abs(np.diff(gray, axis=1)).mean()
        gy = np.abs(np.diff(gray, axis=0)).mean()
        thumb = I._block_mean_resize(gray, 4, 4).ravel() / 255.0
        out.append(
            (
                r.image_id,
                float(arr[:, :, 0].mean()),
                float(arr[:, :, 1].mean()),
                float(arr[:, :, 2].mean()),
                float(gray.std()),
                float(gx + gy),
                thumb.tolist(),
            )
        )
    return pd.DataFrame(
        out,
        columns=[
            "image_id", "mean_r", "mean_g", "mean_b",
            "contrast", "edge_energy", "thumb",
        ],
    )


def extract_features(images: DataFrame) -> DataFrame:
    """Cheap visual features per image: channel means, contrast (std),
    gradient energy, 4x4 block-mean thumbnail (the embedding stand-in
    for downstream similarity ops)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield extract_features_pdf(pdf)

    return images.mapInPandas(run, schema=FEATURES_SCHEMA)


def phash_near_dups(images: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Perceptual near-duplicate image pairs by phash hamming distance,
    banded like SimHash with ``max_hamming + 1`` bands over the 64-bit
    hash — the pigeonhole guarantee (some band survives untouched) then
    holds for EXACTLY the requested distance, for any ``max_hamming``
    ≤ 63. Output: (img_a, img_b, hamming)."""
    n_bands = max_hamming + 1
    base, extra = divmod(64, n_bands)
    # band widths: `extra` bands of base+1 bits, the rest base bits
    widths = [base + 1 if i < extra else base for i in range(n_bands)]
    starts = [sum(widths[:i]) for i in range(n_bands)]
    # full-width band (max_hamming=0): the signed-64 all-ones mask is -1
    masks = [((1 << w) - 1) if w < 64 else -1 for w in widths]
    t = images.select(F.col("image_id").alias("_id"), F.col("phash").alias("_ph"))
    banded = t.select(
        "_id",
        "_ph",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("_ph"), starts[i]).bitwiseAND(
                        F.lit(masks[i])
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("_band", "_key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    ham = F.bit_count(F.col("a._ph").bitwiseXOR(F.col("b._ph")))
    return (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._key") == F.col("b._key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("img_a"),
            F.col("b._id").alias("img_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["img_a", "img_b"])
    )
