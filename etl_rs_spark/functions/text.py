"""Text analysis — language ID, quality scoring, token counting,
fingerprinting. All pure Column expressions (JVM-side, codegen'd); no
Python in the hot path. These are the training-data-pipeline operators
layered beyond the reference's surface (the reference has no scalar
function library at all — SURVEY.md §2.7)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small, deterministic stopword lists for n-gram-heuristic language ID
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "pt": ["de", "a", "o", "que", "e", "do", "da", "em", "um", "para"],
    "es": ["de", "la", "que", "el", "en", "y", "a", "los", "se", "del"],
    "de": ["der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenizer -> array<string>."""
    return F.split(F.trim(_c(col)), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: splits on whitespace AND
    letter/digit/punct boundaries — a cheap, deterministic proxy for BPE
    token counts (regex segmentation, no vocab)."""
    pieces = F.split(
        F.trim(_c(col)), r"(?<=\p{L})(?=\p{N})|(?<=\p{N})(?=\p{L})|\s+|(?=[^\p{L}\p{N}\s])"
    )
    return F.size(F.filter(pieces, lambda p: p != ""))


def stopword_hits(col: Column | str, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(F.lower(_c(col))), lambda w: w.isin(*words)))


def lang_id(col: Column | str) -> Column:
    """N-gram-heuristic language ID: highest stopword hit rate wins;
    null for empty text, 'und' (undetermined) when nothing matches."""
    c = _c(col)
    scored = F.array(
        *[
            F.struct(
                stopword_hits(c, lang).alias("hits"), F.lit(lang).alias("lang")
            )
            for lang in STOPWORDS
        ]
    )
    best = F.array_max(scored)  # struct compare: hits first, then lang
    return (
        F.when(F.length(F.trim(c)) == 0, F.lit(None))
        .when(best["hits"] == 0, F.lit("und"))
        .otherwise(best["lang"])
    )


def punct_ratio(col: Column | str) -> Column:
    c = _c(col)
    n = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[\p{L}\p{N}\s]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(None))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    n = token_count(_c(col))
    return F.when(n > 0, stopword_hits(_c(col), lang) / n).otherwise(F.lit(None))


def mean_word_len(col: Column | str) -> Column:
    c = _c(col)
    n = token_count(c)
    return F.when(
        n > 0, F.length(F.regexp_replace(c, r"\s+", "")) / n
    ).otherwise(F.lit(None))


def quality_score(col: Column | str) -> Column:
    """Composite document-quality score in [0,1]: favors texts with a
    healthy stopword ratio (natural language), moderate word length, low
    punctuation density, and non-trivial length. Deterministic, tunable;
    the standard pre-training quality-gate shape."""
    c = _c(col)
    len_score = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    stop = F.coalesce(stopword_ratio(c), F.lit(0.0))
    stop_score = F.least(stop / F.lit(0.12), F.lit(1.0))
    wl = F.coalesce(mean_word_len(c), F.lit(0.0))
    wl_score = F.when((wl >= 3) & (wl <= 10), 1.0).otherwise(0.4)
    punct = F.coalesce(punct_ratio(c), F.lit(1.0))
    punct_score = F.when(punct < 0.2, 1.0).otherwise(F.greatest(F.lit(0.0), 1 - punct))
    return F.round(
        0.25 * len_score + 0.35 * stop_score + 0.2 * wl_score + 0.2 * punct_score, 6
    )


def fingerprint(col: Column | str) -> Column:
    """64-bit document fingerprint: xxhash64 of the
    whitespace/case-normalized text — equal fingerprints == exact
    near-normalized duplicates (the exact-dedup key)."""
    norm = F.lower(F.regexp_replace(F.trim(_c(col)), r"\s+", " "))
    return F.xxhash64(norm)


def shingle_fingerprint(col: Column | str, k: int = 5) -> Column:
    """Rolling-hash shingle fingerprint: min xxhash64 over word
    k-shingles — one minhash, robust to small edits; equal values are a
    strong near-dup signal."""
    w = tokens(F.lower(_c(col)))
    n = F.size(w)
    idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    shingles = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, k)))
    return F.array_min(F.transform(shingles, lambda s: F.xxhash64(s)))
