"""Golden-fixture DuckDB oracles for the codec-bound queries.

The driver's correctness gate compares each registered query against a
DuckDB SQL string. For queries whose inputs are *binary payloads*
(images/audio/video), the transformation itself is not SQL-expressible
— but the fixture tables ARE deterministic, so the expected output can
be materialized driver-side by the very same row kernels the operators
run inside ``mapInPandas`` (single source of truth — see
``operators.images.decode_stats_pdf`` etc.) and rendered as a literal
``VALUES`` table.

What such a golden oracle genuinely verifies: the *distributed*
execution — Arrow serialization both ways, batch boundaries, row
routing, schema mapping, partitioning — produces bit-for-bit the rows
the reference local computation produces. What it does NOT verify is
the kernel math itself; that is pytest territory
(tests/test_images.py, test_multimodal.py decode/phash/PSNR gates per
the BASELINE input_hint). The two mixed-mode oracles
(``phash_dedup_oracle``, ``image_pip_oracle``) go further: only the
*inputs* (phash / lon-lat) are injected as literals and DuckDB
independently recomputes the join — brute-force all-pairs hamming vs
the engine's banded join, interval algebra vs the engine's tiled
ray-cast PIP.

Scale-factor pinning: the driver value-checks oracles at sf=0.01 only
(TESTDATA.md), so golden oracles are generated at that sf's fixture
sizes. Float literals are ``repr``-rendered — the shortest
round-tripping decimal — and both engines' parsers are correctly
rounding, so values survive the text round-trip bit-exactly.
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np
import pandas as pd

#: fixture sizes at the gate's scale factor (sf0.01 — TESTDATA.md)
GATE_N_IMAGES = 400
GATE_N_SMALL = 200
GATE_N_VIDEOS = 20


# ---------------------------------------------------------------------------
# literal rendering
# ---------------------------------------------------------------------------

def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        if not np.isfinite(v):
            # repr(inf)/repr(nan) would render as 'infe0'/'nane0' —
            # unparseable SQL that fails the gate with a cryptic
            # DuckDB syntax error instead of a value diff. Non-finite
            # kernel outputs must be sentinel-mapped upstream (as
            # decode_stats does for psnr=inf); surfacing one here is
            # a bug worth a loud failure.
            raise ValueError(f"non-finite golden literal: {v!r}")
        r = repr(float(v))
        return r if ("e" in r or "E" in r) else r + "e0"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise TypeError(f"unsupported golden literal type {type(v)}")


def values_sql(pdf: pd.DataFrame, casts: dict[str, str]) -> str:
    """Render a pandas frame as ``SELECT ... FROM (VALUES ...)`` with
    explicit column casts (VALUES type inference is engine-specific)."""
    cols = list(pdf.columns)
    rows = ",\n".join(
        "(" + ", ".join(_lit(v) for v in row) + ")"
        for row in pdf.itertuples(index=False, name=None)
    )
    sel = ", ".join(f"CAST({c} AS {casts[c]}) AS {c}" for c in cols)
    return f"SELECT {sel} FROM (VALUES\n{rows}\n) AS t({', '.join(cols)})"


# ---------------------------------------------------------------------------
# shared fixture materialization (cached — several oracles reuse it)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _images_pdf(n: int) -> pd.DataFrame:
    from osm2shp_spark.sources.fixtures import generate_images_pdf

    return generate_images_pdf(n)


# ---------------------------------------------------------------------------
# golden oracles (full expected output as literals)
# ---------------------------------------------------------------------------

def decode_stats_oracle() -> str:
    from osm2shp_spark.operators.images import decode_stats_pdf

    out = decode_stats_pdf(_images_pdf(GATE_N_IMAGES))
    return values_sql(
        out,
        {
            "image_id": "VARCHAR", "fmt": "VARCHAR", "w": "INTEGER",
            "h": "INTEGER", "decode_ok": "BOOLEAN",
            "width_matches": "BOOLEAN", "phash_matches": "BOOLEAN",
            "mean_px": "DOUBLE", "psnr": "DOUBLE", "caption": "VARCHAR",
        },
    )


def image_features_oracle() -> str:
    from osm2shp_spark.operators.images import extract_features_pdf

    out = extract_features_pdf(_images_pdf(GATE_N_IMAGES))
    flat = out[["image_id", "mean_r", "mean_g", "mean_b", "contrast", "edge_energy"]].copy()
    for i in range(16):
        flat[f"thumb_{i:02d}"] = out["thumb"].map(lambda t, i=i: t[i])
    casts = {"image_id": "VARCHAR"}
    casts.update({c: "DOUBLE" for c in flat.columns if c != "image_id"})
    return values_sql(flat, casts)


def image_resize_oracle(out_w: int = 16, out_h: int = 16) -> str:
    from osm2shp_spark.operators.multimodal import resize_images_pdf

    out = resize_images_pdf(_images_pdf(GATE_N_SMALL), out_w, out_h)
    out["bytes_md5"] = out["bytes"].map(lambda b: hashlib.md5(b).hexdigest())
    out = out[["image_id", "out_w", "out_h", "fmt", "bytes_md5"]]
    return values_sql(
        out,
        {
            "image_id": "VARCHAR", "out_w": "INTEGER", "out_h": "INTEGER",
            "fmt": "VARCHAR", "bytes_md5": "VARCHAR",
        },
    )


def audio_features_oracle() -> str:
    from osm2shp_spark.operators.multimodal import audio_features_pdf
    from osm2shp_spark.sources.fixtures import generate_audio_pdf

    out = audio_features_pdf(generate_audio_pdf(GATE_N_SMALL))
    return values_sql(
        out,
        {
            "audio_id": "VARCHAR", "duration_s": "DOUBLE", "rms": "DOUBLE",
            "zero_crossings": "BIGINT", "peak": "DOUBLE",
        },
    )


def video_frame_sample_oracle(every_nth: int = 2) -> str:
    from osm2shp_spark.operators.multimodal import sample_video_frames_pdf
    from osm2shp_spark.sources.fixtures import generate_videos_pdf

    out = sample_video_frames_pdf(generate_videos_pdf(GATE_N_VIDEOS), every_nth)
    return values_sql(
        out,
        {
            "video_id": "VARCHAR", "frame_idx": "INTEGER", "w": "INTEGER",
            "h": "INTEGER", "mean_px": "DOUBLE", "phash": "BIGINT",
        },
    )


# ---------------------------------------------------------------------------
# mixed-mode oracles: literal INPUTS + independent SQL recomputation
# ---------------------------------------------------------------------------

def phash_dedup_oracle(max_hamming: int = 6) -> str:
    """Brute-force all-pairs hamming in DuckDB over the injected phash
    column — independently re-derives the pair set the engine's banded
    join must find (the pigeonhole banding guarantees 100% recall at
    ``<= max_hamming``, so banded == brute force exactly)."""
    ph = _images_pdf(GATE_N_IMAGES)[["image_id", "phash"]]
    vals = values_sql(ph, {"image_id": "VARCHAR", "phash": "BIGINT"})
    return f"""
WITH ph AS ({vals})
SELECT a.image_id AS img_a, b.image_id AS img_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
FROM ph a JOIN ph b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= {max_hamming}
"""


def adaptive_cells_oracle(
    images_sql: str,
    sample_mod: int = 20,
    base_res: int = 7,
    hot_threshold: int = 20,
) -> str:
    """Mixed-mode oracle for the N6 adaptive-cell-splitting operator
    (``operators.skew.adaptive_cells``): only the hex cell IDS are
    golden-injected (computed driver-side with the same NumPy kernel
    the executors run); the hot-cell RE-INDEX DECISIONS — histogram at
    each level, strict ``n > threshold`` hotness, re-index only of
    points split in the previous iteration — are recomputed as
    independent SQL over those counts. A broken histogram filter,
    off-by-one threshold, or wrong-level re-index flips cell_adaptive/
    cell_res and breaks the value hash. Pinned to the gate's sf0.01
    tables like every golden."""
    import duckdb

    from osm2shp_spark.functions import hexgrid

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        "'/root/testdata/sf0.01/orders.parquet'"
    )
    pts = con.execute(
        f"SELECT img_key, lon, lat FROM ({images_sql}) i "
        f"WHERE img_key % {sample_mod} = 0"
    ).df()
    con.close()
    lon = pts["lon"].to_numpy()
    lat = pts["lat"].to_numpy()
    exp = pd.DataFrame({"img_key": pts["img_key"].astype("int64")})
    casts = {"img_key": "BIGINT"}
    for r in (base_res, base_res + 1, base_res + 2):
        exp[f"c{r}"] = hexgrid.hex_cell(lon, lat, r)
        casts[f"c{r}"] = "BIGINT"
    vals = values_sql(exp, casts)
    r0, r1, r2 = base_res, base_res + 1, base_res + 2
    t = hot_threshold
    return f"""
WITH pts AS ({vals}),
h0 AS (SELECT c{r0} AS cell, count(*) AS n FROM pts GROUP BY c{r0}),
s1 AS (
    SELECT p.img_key, p.c{r1}, p.c{r2},
           CASE WHEN h.n > {t} THEN p.c{r1} ELSE p.c{r0} END AS cell1,
           CASE WHEN h.n > {t} THEN {r1} ELSE {r0} END AS res1
    FROM pts p JOIN h0 h ON p.c{r0} = h.cell
),
h1 AS (
    SELECT cell1 AS cell, count(*) AS n FROM s1
    WHERE res1 = {r1} GROUP BY cell1
),
fin AS (
    SELECT s.img_key,
           CASE WHEN s.res1 = {r1} AND h.n > {t}
                THEN s.c{r2} ELSE s.cell1 END AS cell_adaptive,
           CASE WHEN s.res1 = {r1} AND h.n > {t}
                THEN {r2} ELSE s.res1 END AS cell_res
    FROM s1 s LEFT JOIN h1 h ON s.res1 = {r1} AND s.cell1 = h.cell
)
SELECT img_key, cell_adaptive, CAST(cell_res AS INTEGER) AS cell_res
FROM fin
"""


def point_cells_oracle(images_sql: str, sample_mod: int = 40) -> str:
    """Golden oracle for the N1/N2 point cell family: the GENERATOR
    reads the sampled coordinates through DuckDB (same SQL predicate
    as the Spark query) and computes the expected cell ids driver-side
    with the same NumPy kernels the executors run
    (`functions.hexgrid` / `functions.s2`); the returned SQL is that
    expectation as a VALUES table. Verifies the distributed assignment
    (Arrow struct family, row routing) bit-for-bit; kernel math itself
    is property-pytest territory (tests/test_properties.py). Pinned to
    the gate's sf0.01 tables like every golden."""
    import duckdb

    from osm2shp_spark.functions import hexgrid, s2

    con = duckdb.connect()
    for t in ("orders",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.01/{t}.parquet'"
        )
    pts = con.execute(
        f"SELECT img_key, lon, lat FROM ({images_sql}) i "
        f"WHERE img_key % {sample_mod} = 0"
    ).df()
    con.close()
    lon = pts["lon"].to_numpy()
    lat = pts["lat"].to_numpy()
    ids = s2.cell_id(lat, lon, 12)
    exp = pd.DataFrame(
        {
            "img_key": pts["img_key"].astype("int64"),
            "s2_cell": ids.astype("int64"),
            "s2_token": s2.token(ids),
        }
    )
    casts = {"img_key": "BIGINT", "s2_cell": "BIGINT", "s2_token": "VARCHAR"}
    for r in (7, 8, 9, 10, 11, 12):
        exp[f"hex_r{r}"] = hexgrid.hex_cell(lon, lat, r)
        casts[f"hex_r{r}"] = "BIGINT"
    return values_sql(exp, casts)


def multimodal_pairs_oracle() -> str:
    """(image, caption) training-pair curation, recomputed
    independently: captions + phashes are injected as literals, then
    DuckDB re-derives language ID (the text-op oracle twin), BPE-ish
    token counts, and the per-phash canonical choice with its own
    window function — everything the engine's single-shuffle plan
    computes distributively."""
    from osm2shp_spark.operators.text import BPE_PATTERN, lang_id_oracle

    pdf = _images_pdf(GATE_N_IMAGES)[["image_id", "caption", "phash"]]
    vals = values_sql(
        pdf, {"image_id": "VARCHAR", "caption": "VARCHAR", "phash": "BIGINT"}
    )
    lang_sql = lang_id_oracle(
        "SELECT image_id AS doc_id, caption AS text FROM imgs"
    )
    return f"""
WITH imgs AS ({vals}),
lang AS ({lang_sql})
SELECT i.image_id,
       l.pred_lang,
       CAST(len(regexp_extract_all(i.caption, '{BPE_PATTERN}')) AS INTEGER)
           AS n_bpe_tokens,
       i.image_id = min(i.image_id) OVER (PARTITION BY i.phash)
           AS is_canonical
FROM imgs i JOIN lang l ON l.doc_id = i.image_id
"""


def image_pip_oracle(rects_sql: str) -> str:
    """Interval-algebra PIP truth in DuckDB over injected point
    coordinates — independently re-derives the containment set the
    engine's tiled candidate join + rect fast path must produce
    (strict interior, matching the engine's documented boundary
    convention; fixture coords never touch rect bounds by design)."""
    pts = _images_pdf(GATE_N_IMAGES)[["image_id", "caption", "lon", "lat"]]
    vals = values_sql(
        pts,
        {"image_id": "VARCHAR", "caption": "VARCHAR", "lon": "DOUBLE", "lat": "DOUBLE"},
    )
    return f"""
WITH pts AS ({vals}),
rects AS ({rects_sql})
SELECT p.image_id, p.caption, r.rect_id, r.layer
FROM pts p JOIN rects r
  ON p.lon > r.lon_min AND p.lon < r.lon_max
 AND p.lat > r.lat_min AND p.lat < r.lat_max
"""
