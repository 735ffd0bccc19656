"""Text analysis operators for training-data pipelines (driver mandate).

Language ID (stopword n-gram heuristic), quality scoring, token counting,
document fingerprinting.  Everything is a JVM-side column expression —
deliberately SQL-expressible so each operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny per-language stopword inventories for the heuristic language-ID
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"],
    "es": ["el", "la", "los", "las", "es", "una", "en", "que", "por", "con"],
}


def token_count(text_col: str = "text") -> F.Column:
    """Whitespace token count (regex-split; empty string → 0)."""
    trimmed = F.trim(F.col(text_col))
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


# GPT-2-style pre-tokenizer (Radford et al. 2019, public pattern), made
# lookahead-free so the SAME string runs on Java regex (Spark) and RE2
# (DuckDB oracle): contractions, space-prefixed letter/digit/punctuation
# runs, residual whitespace runs.  Dropping the original's `\s+(?!\S)`
# merges a multi-space run into one token instead of splitting off the
# last space — the unit COUNT is unchanged, only the split points differ.
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def word_token_count(text_col: str = "text") -> F.Column:
    """BPE-ish token proxy: GPT-2 pre-tokenizer unit count (JVM-side
    regexp_extract_all; no UDF)."""
    return F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit(BPE_PRETOKEN_PATTERN), F.lit(0)
        )
    )


def _stopword_hits(text_col: str, words: list[str]) -> F.Column:
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pattern), F.lit(0))
    )


def lang_scores(text_col: str = "text") -> dict[str, F.Column]:
    """Per-language stopword-hit counts."""
    return {lang: _stopword_hits(text_col, words) for lang, words in LANG_STOPWORDS.items()}


def lang_id(text_col: str = "text") -> F.Column:
    """Argmax language by stopword hits; 'und' (undetermined) when no hits.

    Ties break by language code order — deterministic, oracle-friendly.
    """
    scores = lang_scores(text_col)
    best_score = F.greatest(*scores.values())
    result = F.lit("und")
    for lang in sorted(scores, reverse=True):
        result = F.when(
            (scores[lang] > 0) & (scores[lang] == best_score), F.lit(lang)
        ).otherwise(result)
    return result


def quality_score(text_col: str = "text") -> F.Column:
    """[0, 1] quality heuristic: length band + alpha ratio + stopword presence.

    The components mirror common pretraining-data filters (length, symbol
    ratio, stopword ratio); weights are fixed and documented, not learned.
    """
    n_chars = F.length(F.col(text_col))
    n_alpha = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z]"), F.lit(0))
    )
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    n_tokens = token_count(text_col)
    length_ok = F.when((n_tokens >= 5) & (n_tokens <= 100000), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    en_hits = _stopword_hits(text_col, LANG_STOPWORDS["en"])
    stopword_signal = F.when(n_tokens > 0, F.least(en_hits / n_tokens * 5, F.lit(1.0))).otherwise(F.lit(0.0))
    return F.round(0.4 * length_ok + 0.4 * alpha_ratio + 0.2 * stopword_signal, 6)


def fingerprint(text_col: str = "text") -> F.Column:
    """Deterministic document fingerprint: md5 of the normalised text."""
    return F.md5(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))


def document_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per document with every text statistic."""
    return docs.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        word_token_count(text_col).alias("n_word_tokens"),
        lang_id(text_col).alias("lang_pred"),
        quality_score(text_col).alias("quality"),
        fingerprint(text_col).alias("fingerprint"),
    )
