"""Text analysis scalar functions — all JVM-side Column builders.

Covers the training-data-pipeline text surface: tokenization, word n-gram
shingling (the reference's hash_ngrams shingler, util.cpp:47-68, re-expressed
over Spark arrays), token counting, quality scoring, language-ID heuristic,
and rolling-hash document fingerprinting.  Everything here compiles to
whole-stage-codegen expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from sketch_spark.functions.hashing import POLY_B, POLY_P, POLY_TOKEN_B, poly_hash_token_col

# A small English stopword list used by the language-ID heuristic and quality
# score.  Deterministic and mirrored verbatim in the DuckDB oracle SQL.
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization with empty-token removal."""
    return F.filter(F.split(text, r"\s+"), lambda t: F.length(t) > 0)


def tokens_py(text: str) -> list[str]:
    """Python mirror of tokens_col.  Java's regex \\s is the ASCII class
    [ \\t\\n\\x0B\\f\\r] (unlike Python's unicode-aware \\s), so the class is
    spelled out to keep all three engines (Spark, DuckDB/RE2, this mirror)
    identical."""
    import re

    return [t for t in re.split("[ \t\n\x0b\f\r]+", text) if t]


def word_shingles_col(toks: Column, n: int = 3) -> Column:
    """Array of word n-gram shingle strings (space-joined), L-n+1 of them.

    Mirrors the reference shingler's sliding window semantics
    (util.cpp:47-68: L items -> max(L-n+1, 0) shingles).
    """
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0)))
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def shingle_hashes_col(text: Column, n: int = 3, seed: int = 42) -> Column:
    """Array of xxhash64 shingle hashes of word n-grams — the scale path.

    xxhash64 is Spark's builtin XXH64 (JVM, codegen).  The reference uses
    XXH3 (util.cpp:47-68); same family, equivalent collision behavior for
    dedup.  `seed` defaults to Spark's builtin default (42).
    """
    sh = word_shingles_col(tokens_col(text), n)
    return F.transform(sh, lambda s: F.xxhash64(s, F.lit(seed)))


def poly_shingle_hashes_col(text: Column, n: int = 3) -> Column:
    """Engine-portable shingle hashes: per-token char fold combined per
    n-gram, identical arithmetic in DuckDB (see entry oracle SQL)."""
    toks = tokens_col(text)
    tok_hashes = F.transform(toks, poly_hash_token_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0)))
    combine = F.when(F.size(toks) < n, F.array().cast("array<long>")).otherwise(
        F.transform(
            idx,
            lambda i: F.aggregate(
                F.slice(tok_hashes, i, n),
                F.lit(-1).cast("long"),
                lambda acc, h: F.when(acc < 0, h).otherwise(
                    (acc * F.lit(POLY_TOKEN_B) + h) % F.lit(POLY_P)
                ),
            ),
        )
    )
    return combine


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def char_count_col(text: Column) -> Column:
    return F.length(text)


def stopword_count_col(text: Column) -> Column:
    toks = tokens_col(F.lower(text))
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def punct_count_col(text: Column) -> Column:
    """Number of characters that are not alphanumeric or whitespace."""
    return F.length(text) - F.length(F.regexp_replace(text, r"[^A-Za-z0-9\s]", ""))


def quality_flags_col(text: Column, min_tokens: int = 5, max_punct_ratio_pct: int = 20):
    """Integer quality signals (ints, not floats, for cross-engine equality):
    returns (n_tokens, n_chars, n_stopwords, n_punct, passes int)."""
    nt = token_count_col(text)
    nc = char_count_col(text)
    nsw = stopword_count_col(text)
    np_ = punct_count_col(text)
    passes = (
        (nt >= F.lit(min_tokens)) & (np_ * F.lit(100) <= nc * F.lit(max_punct_ratio_pct))
    ).cast("int")
    return nt, nc, nsw, np_, passes


def langid_col(text: Column) -> Column:
    """Tiny n-gram/stopword language heuristic: 'en' when >=2% of tokens are
    English stopwords and text is ASCII-dominant, else 'unknown'."""
    nt = token_count_col(text)
    nsw = stopword_count_col(text)
    ascii_ok = F.length(F.regexp_replace(text, r"[\x00-\x7F]", "")) * F.lit(50) <= F.length(text)
    return (
        F.when((nt > 0) & (nsw * F.lit(50) >= nt) & ascii_ok, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def fingerprint_col(text: Column) -> Column:
    """Document fingerprint: polynomial rolling hash over tokens (order-
    sensitive), engine-portable (mod-prime arithmetic, no overflow)."""
    toks = tokens_col(text)
    tok_hashes = F.transform(toks, poly_hash_token_col)
    return F.aggregate(
        tok_hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(POLY_TOKEN_B) + h) % F.lit(POLY_P),
    )


def char_ngrams_col(text: Column, n: int = 5) -> Column:
    """Array of character n-grams (for n-gram Jaccard)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - F.lit(n - 1), F.lit(0)))
    return F.when(F.length(text) < n, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.substr(text, i, F.lit(n)))
    )


__all__ = [
    "STOPWORDS",
    "tokens_col",
    "word_shingles_col",
    "shingle_hashes_col",
    "poly_shingle_hashes_col",
    "token_count_col",
    "char_count_col",
    "stopword_count_col",
    "punct_count_col",
    "quality_flags_col",
    "langid_col",
    "fingerprint_col",
    "char_ngrams_col",
    "POLY_B",
]
