"""Text-analysis operators for training-data curation: token stats,
language ID (stopword heuristic), quality scoring, fingerprinting.

Everything here is pure Catalyst (JVM, codegen) — string splitting,
array set ops, arithmetic — with SQL twins for the DuckDB oracle, so
every operator is value-checked by the driver gate. Constants use the
``dlit`` double-literal convention (see operators.spatial.dlit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osm2shp_spark.operators.spatial import dlit

#: tiny per-language stopword lists (heuristic lang-id). The *function*
#: is the contract (engine and oracle compute the same score), not
#: linguistic accuracy.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "mit", "ist"),
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "es"),
    "fr": ("le", "la", "de", "et", "que", "en", "est"),
    "zh": ("de", "le", "shi", "bu", "wo", "zai", "you"),
}

#: punctuation characters counted by the quality score
PUNCT_CHARS = (".", ",", "!", "?", ";")


def _toks_sql(text_col: str) -> str:
    return f"split(lower({text_col}), ' ')"


def _toks_sql_duck(text_col: str) -> str:
    return f"string_split(lower({text_col}), ' ')"


#: BPE-style pre-tokenizer classes (letters / digits / other-symbol
#: runs) — the standard cheap token-count estimator; the character-
#: class pattern evaluates identically under Java regex (Spark) and
#: RE2 (DuckDB)
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token statistics: whitespace tokens, distinct tokens,
    BPE-ish regex token count, chars, type-token ratio."""
    toks = F.split(F.lower(F.col("text")), " ")
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    bpe = F.size(F.expr(f"regexp_extract_all(text, '{BPE_PATTERN}', 0)"))
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        nd.alias("n_distinct"),
        bpe.alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_measured"),
        (nd.cast("double") / n).alias("type_token_ratio"),
    )


def token_stats_oracle(docs_sql: str) -> str:
    t = _toks_sql_duck("text")
    return f"""
WITH docs AS ({docs_sql})
SELECT doc_id,
       len({t}) AS n_tokens,
       len(list_distinct({t})) AS n_distinct,
       len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe_tokens,
       length(text) AS n_chars_measured,
       CAST(len(list_distinct({t})) AS DOUBLE) / len({t}) AS type_token_ratio
FROM docs
"""


def _lang_score(toks, lang: str):
    words = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.array_intersect(toks, words))


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-overlap language ID: argmax score, alphabetical
    tie-break, 'und' (undetermined) when all scores are 0."""
    toks = F.array_distinct(F.split(F.lower(F.col("text")), " "))
    scored = docs.select(
        "doc_id",
        *[_lang_score(toks, lg).alias(f"score_{lg}") for lg in sorted(LANG_STOPWORDS)],
    )
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lg in langs:  # alphabetical order = deterministic tie-break
        pred = pred.when(F.col(f"score_{lg}") == best, F.lit(lg))
    return scored.select("doc_id", pred.alias("pred_lang"), best.alias("best_score"))


def lang_id_oracle(docs_sql: str) -> str:
    t = _toks_sql_duck("text")
    langs = sorted(LANG_STOPWORDS)
    scores = ", ".join(
        f"len(list_intersect(list_distinct({t}), "
        f"[{', '.join(repr(w) for w in LANG_STOPWORDS[lg])}])) AS score_{lg}"
        for lg in langs
    )
    best = "greatest(" + ", ".join(f"score_{lg}" for lg in langs) + ")"
    case = "CASE WHEN best = 0 THEN 'und' " + " ".join(
        f"WHEN score_{lg} = best THEN '{lg}'" for lg in langs
    ) + " END"
    return f"""
WITH docs AS ({docs_sql}),
s AS (SELECT doc_id, {scores} FROM docs),
b AS (SELECT *, {best} AS best FROM s)
SELECT doc_id, {case} AS pred_lang, best AS best_score FROM b
"""


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic document quality in [0,1]: length band + punctuation
    ratio + stopword presence (the standard cheap pre-filter stack for
    web-scale corpus curation, composed from deterministic arithmetic).
    """
    text = F.col("text")
    n_chars = F.length(text)
    punct = sum(
        (n_chars - F.length(F.replace(text, F.lit(c), F.lit("")))) for c in PUNCT_CHARS
    )
    toks = F.split(F.lower(text), " ")
    n_toks = F.size(toks)
    all_stop = F.array(
        *[F.lit(w) for ws in (LANG_STOPWORDS[lg] for lg in sorted(LANG_STOPWORDS)) for w in ws]
    )
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), all_stop))
    len_score = F.when((n_chars >= 100) & (n_chars <= 2000), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    punct_ratio = punct.cast("double") / n_chars
    punct_score = F.when(punct_ratio <= 0.1, F.lit(1.0)).otherwise(F.lit(0.5))
    stop_score = F.when(stop_hits >= 2, F.lit(1.0)).otherwise(F.lit(0.5))
    q = (len_score * 0.4 + punct_score * 0.3 + stop_score * 0.3).alias("quality")
    return docs.select(
        "doc_id", q, punct_ratio.alias("punct_ratio"), stop_hits.alias("stop_hits")
    )


def quality_score_oracle(docs_sql: str) -> str:
    t = _toks_sql_duck("text")
    punct = " + ".join(
        f"(length(text) - length(replace(text, '{c}', '')))"
        for c in PUNCT_CHARS
    )
    all_stop = [w for lg in sorted(LANG_STOPWORDS) for w in LANG_STOPWORDS[lg]]
    stop_list = "[" + ", ".join(repr(w) for w in all_stop) + "]"
    return f"""
WITH docs AS ({docs_sql}),
m AS (
    SELECT doc_id,
           length(text) AS n_chars,
           CAST({punct} AS DOUBLE) / length(text) AS punct_ratio,
           len(list_intersect(list_distinct({t}), {stop_list})) AS stop_hits
    FROM docs
)
SELECT doc_id,
       (CASE WHEN n_chars >= 100 AND n_chars <= 2000 THEN {dlit(1.0)}
             ELSE {dlit(0.5)} END) * {dlit(0.4)}
       + (CASE WHEN punct_ratio <= {dlit(0.1)} THEN {dlit(1.0)}
               ELSE {dlit(0.5)} END) * {dlit(0.3)}
       + (CASE WHEN stop_hits >= 2 THEN {dlit(1.0)}
               ELSE {dlit(0.5)} END) * {dlit(0.3)} AS quality,
       punct_ratio, stop_hits
FROM m
"""


def winnow_fingerprints(
    docs: DataFrame, kgram: int = 5, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (the classic rolling-hash local
    minima scheme from the public MOSS/winnowing paper): k-gram rolling
    hashes over the normalized character stream, keep each window's
    minimum → a compact, position-robust fingerprint set. Output:
    (doc_id, n_fingerprints, min_fp, fp_xor) — the set summary columns
    downstream dedup joins key on."""
    B = np.uint64(257)
    MOD_MASK = np.uint64((1 << 61) - 1)

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("n_fingerprints", T.LongType()),
                T.StructField("min_fp", T.LongType()),
                T.StructField("fp_xor", T.LongType()),
            ]
        )
    )
    def _w(text: pd.Series) -> pd.DataFrame:
        out = []
        for t in text:
            s = np.frombuffer(" ".join((t or "").lower().split()).encode(), np.uint8)
            if len(s) < kgram:
                out.append((0, 0, 0))
                continue
            with np.errstate(over="ignore"):
                # rolling polynomial hash of all k-grams, vectorized:
                # prefix hashes with wraparound uint64 arithmetic
                powers = np.empty(len(s), np.uint64)
                powers[0] = np.uint64(1)
                for i in range(1, len(s)):
                    powers[i] = powers[i - 1] * B
                pref = np.zeros(len(s) + 1, np.uint64)
                for i in range(len(s)):
                    pref[i + 1] = pref[i] * B + np.uint64(s[i])
                kg = pref[kgram:] - pref[:-kgram] * powers[kgram]
                kg &= MOD_MASK
                # winnow: min per sliding window (rightmost-min rule)
                n = len(kg) - window + 1
                if n <= 0:
                    picks = {int(kg.min())}
                else:
                    idx = np.array(
                        [int(np.flatnonzero(kg[i : i + window] == kg[i : i + window].min())[-1]) + i for i in range(n)]
                    )
                    picks = {int(kg[i]) for i in np.unique(idx)}
            arr = np.array(sorted(picks), np.uint64)
            x = np.uint64(0)
            for v in arr:
                x ^= v
            out.append((len(arr), int(arr[0]), int(np.int64(x))))
        return pd.DataFrame(out, columns=["n_fingerprints", "min_fp", "fp_xor"])

    return docs.select("doc_id", _w(F.col("text")).alias("_fp")).select(
        "doc_id",
        F.col("_fp.n_fingerprints").alias("n_fingerprints"),
        F.col("_fp.min_fp").alias("min_fp"),
        F.col("_fp.fp_xor").alias("fp_xor"),
    )


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Content fingerprints: md5 of normalized text + a 16-hex-digit
    prefix as a compact join key."""
    fp = F.md5(F.lower(F.col("text")))
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 16).alias("fp_prefix"),
    )


def doc_fingerprint_oracle(docs_sql: str) -> str:
    return f"""
WITH docs AS ({docs_sql})
SELECT doc_id, md5(lower(text)) AS fingerprint,
       substr(md5(lower(text)), 1, 16) AS fp_prefix
FROM docs
"""
