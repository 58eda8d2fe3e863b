"""Text analysis: tokenization, quality scoring, language ID, document
fingerprinting.

Everything is a pure column expression with an exact ANSI-SQL twin (the
DuckDB oracles in ``__spark_entry__``): same splits, same regexes (kept to
the common subset of Java regex and RE2), same arithmetic — so results are
bit-identical across engines. No UDFs anywhere: at 100 TB these run inside
whole-stage codegen scanning parquet with only the needed columns.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# a BPE-ish lexer: letter runs, digit runs, single punctuation marks
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic; deterministic, ordered dict => deterministic tie-break
LANG_STOPWORDS = {
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "en": ["the", "and", "of", "to", "is", "in"],
    "es": ["el", "los", "las", "y", "es", "que"],
    "fr": ["le", "les", "et", "est", "dans", "que"],
}

QUALITY_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is"]


def tokens(col) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.when(c == "", F.array().cast("array<string>")).otherwise(
        F.split(c, r"\s+")
    )


def token_count(col) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col) -> Column:
    """Token count under the BPE-ish lexer regex."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def quality_columns(col="text") -> dict[str, Column]:
    """Quality-score components (SURVEY-mandated quality scoring):
    length, token stats, punctuation ratio, stopword hit ratio, and a
    single blended score in [0,1]."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    # occurrences (not distinct): filter tokens against the stopword list
    stops = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^A-Za-z0-9\s]"), F.lit(0)))
    avg_token_len = F.when(n_tokens > 0,
                           (n_chars - (n_tokens - 1)) / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    # blended heuristic: long enough, readable token lengths, some stopwords,
    # little punctuation soup
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + F.when((avg_token_len >= 3) & (avg_token_len <= 10), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * F.lit(0.2)
        + F.when(punct_ratio < 0.1, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": avg_token_len,
        "stop_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "quality": score,
    }


def language_id(col="text") -> Column:
    """Stopword-vote language ID: score = number of tokens present in each
    language's stopword list (occurrences); winner = max score, ties ->
    lexicographically smallest language code; all-zero -> 'und'."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    # argmax over (score, priority): struct comparison is lexicographic, so
    # encoding priority = n_langs - alphabetical_index makes score ties
    # resolve to the alphabetically SMALLEST language code.
    ordered = sorted(LANG_STOPWORDS)
    scored = []
    for i, lang in enumerate(ordered):
        stops = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
        scored.append(F.struct(score.alias("score"),
                               F.lit(len(ordered) - i).alias("pri"),
                               F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scored))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def normalized(col="text") -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-alnum,
    collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    x = F.lower(c)
    x = F.regexp_replace(x, r"[^a-z0-9\s]", "")
    x = F.regexp_replace(x, r"\s+", " ")
    return F.trim(x)


def fingerprint(col="text") -> Column:
    """Document fingerprint: md5 of the normalized text."""
    return F.md5(normalized(col))
