"""Text-analysis operators for LLM-data pipelines.

All native column expressions (JVM codegen, no UDFs): token counting
(whitespace + BPE-ish regex), quality scoring, stopword-n-gram
language ID, and content fingerprinting (md5 canonical + polynomial
rolling hash).  Linear per-row work → trivially scalable; no shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: BPE-ish tokenization: word runs or single non-word-non-space chars.
BPE_TOKEN_PATTERN = r"\w+|[^\w\s]"

#: language-ID stopword regexes (ASCII word-bounded, lowercased input)
LANG_STOPWORD_PATTERNS = {
    "en": r"\b(the|and|of|is|in)\b",
    "fr": r"\b(le|la|les|et|des)\b",
    "es": r"\b(el|los|las|y|del)\b",
    "de": r"\b(der|die|das|und|nicht)\b",
}
CJK_PATTERN = r"[一-鿿]"

QUALITY_STOPWORDS = r"\b(the|a|of|and|to|in|is)\b"


def _ws_tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token statistics."""
    text = F.col(text_col)
    toks = _ws_tokens(text)
    return docs.select(
        "doc_id",
        F.length(text).alias("n_chars_measured"),
        F.size(toks).alias("n_ws_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN)).alias("n_bpe_tokens"),
    )


def quality_score_expr(text: Column) -> Column:
    """Composite quality score in [0, 1]:

    0.4·stopword-ratio + 0.3·length-norm + 0.3·(1 − punct-ratio).

    Single per-row IEEE expression (deterministic), rounded to 6 dp to
    pin the cross-engine comparison.
    """
    n_tokens = F.size(_ws_tokens(text))
    stop_ratio = (
        F.regexp_count(F.lower(text), F.lit(QUALITY_STOPWORDS)).cast("double")
        / n_tokens
    )
    len_norm = F.least(F.lit(1.0), F.length(text).cast("double") / F.lit(500.0))
    punct_ratio = (
        F.regexp_count(text, F.lit(r"[^\w\s]")).cast("double") / F.length(text)
    )
    return F.round(
        F.lit(0.4) * stop_ratio + F.lit(0.3) * len_norm
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio),
        6,
    )


def lang_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit scores per language + argmax guess (CJK presence
    short-circuits to 'zh'; ties resolve en > fr > es > de)."""
    text = F.col(text_col)
    lowered = F.lower(text)
    scores = {
        lang: F.regexp_count(lowered, F.lit(pat))
        for lang, pat in LANG_STOPWORD_PATTERNS.items()
    }
    s_zh = F.regexp_count(text, F.lit(CJK_PATTERN))
    guess = (
        F.when(s_zh > 0, F.lit("zh"))
        .when(
            (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["es"])
            & (scores["en"] >= scores["de"]),
            F.lit("en"),
        )
        .when(
            (scores["fr"] >= scores["es"]) & (scores["fr"] >= scores["de"]),
            F.lit("fr"),
        )
        .when(scores["es"] >= scores["de"], F.lit("es"))
        .otherwise(F.lit("de"))
    )
    return docs.select(
        "doc_id",
        scores["en"].alias("s_en"),
        scores["fr"].alias("s_fr"),
        scores["es"].alias("s_es"),
        scores["de"].alias("s_de"),
        s_zh.alias("s_zh"),
        guess.alias("lang_guess"),
    )


def fingerprint_expr(text: Column) -> Column:
    """Canonical content fingerprint: md5 of the whitespace-collapsed,
    lowercased text."""
    return F.md5(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))))


def rolling_fingerprint_expr(text: Column, window: int = 8) -> Column:
    """Polynomial rolling-hash document fingerprint.

    Karp-Rabin style: hash every ``window``-char substring with a
    base-257 polynomial mod 1_000_000_007, keep the minimum — a
    shift-robust fingerprint (winnowing-lite).  Pure higher-order
    expressions; used by tests, not oracle-compared (not reasonably
    SQL-expressible in DuckDB).
    """
    p = F.lit(1_000_000_007).cast("long")

    def window_hash(i: Column) -> Column:
        chars = F.split(F.substring(text, i, F.lit(window)), "")
        return F.aggregate(
            chars,
            F.lit(0).cast("long"),
            lambda acc, ch: F.pmod(
                acc * 257 + F.coalesce(F.ascii(ch), F.lit(0)), p
            ),
        )

    positions = F.sequence(
        F.lit(1), F.greatest(F.lit(1), F.length(text) - F.lit(window - 1))
    )
    return F.array_min(F.transform(positions, window_hash))
