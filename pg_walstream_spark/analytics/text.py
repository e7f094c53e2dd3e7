"""Text analysis for training-data curation: language ID, quality scoring,
token counting, document fingerprinting. Pure Column expressions with
canonical (oracle-reproducible) definitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingles, tokens

# tiny per-language stopword banks — heuristic n-gram/stopword language ID
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "a"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "pas", "pour", "une", "dans"],
    "es": ["el", "la", "los", "que", "de", "es", "por", "con", "una", "para"],
}


def language_scores(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-language stopword hit counts over word tokens."""
    tok = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("t"))
    aggs = [
        F.sum(F.when(F.col("t").isin(words), 1).otherwise(0)).alias(f"hits_{lang}")
        for lang, words in STOPWORDS.items()
    ]
    return tok.groupBy(id_col).agg(*aggs, F.count(F.lit(1)).alias("n_tokens"))


def language_id(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Predicted language = argmax stopword hits (ties → alphabetical;
    all-zero → 'und' undetermined).

    Hit counts are per-row array expressions (size ∘ filter over the token
    array), not the explode + groupBy of ``language_scores``: the per-doc
    counts are identical, the token-row shuffle disappears (guide §2.4),
    and — matching the per-row oracle SQL exactly — docs with zero tokens
    now yield 'und' instead of being dropped by the explode."""
    tok = tokens(text_col)
    scores = docs.select(
        F.col(id_col),
        *[
            F.size(F.filter(tok, lambda x: x.isin(words))).alias(
                f"hits_{lang}")
            for lang, words in STOPWORDS.items()
        ],
    )
    langs = sorted(STOPWORDS)
    # deterministic fold: strictly-greater keeps the alphabetically-first
    # language on ties
    fold = F.struct(F.lit(-1).alias("h"), F.lit("und").alias("l"))
    for lang in langs:
        fold = F.when(
            F.col(f"hits_{lang}") > fold["h"],
            F.struct(F.col(f"hits_{lang}").alias("h"), F.lit(lang).alias("l")),
        ).otherwise(fold)
    return scores.select(
        F.col(id_col),
        F.when(fold["h"] > 0, fold["l"]).otherwise(F.lit("und")).alias(
            "predicted_lang"
        ),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality features + composite score in [0,1]:
    length band, alpha ratio, punctuation ratio, stopword ratio."""
    t = F.col(text_col)
    length = F.length(t)
    alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    punct = F.length(t) - F.length(F.regexp_replace(t, "[.,;:!?]", ""))
    n_tok = F.size(tokens(text_col))
    en_stop = F.size(
        F.filter(tokens(text_col), lambda x: x.isin(STOPWORDS["en"]))
    )
    alpha_ratio = F.round(alpha / F.greatest(length, F.lit(1)), 6)
    punct_ratio = F.round(punct / F.greatest(length, F.lit(1)), 6)
    stop_ratio = F.round(en_stop / F.greatest(n_tok, F.lit(1)), 6)
    len_band = F.least(length / F.lit(2000.0), F.lit(1.0))
    score = F.round(
        0.4 * alpha_ratio + 0.3 * len_band + 0.2 * stop_ratio
        + 0.1 * (1 - F.least(punct_ratio * 10, F.lit(1.0))),
        6,
    )
    return docs.select(
        F.col(id_col), length.alias("n_chars_computed"),
        alpha_ratio.alias("alpha_ratio"), punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"), F.round(score, 6).alias("quality"),
    )


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish subword count (word chars split and
    punctuation as single tokens — the classic pre-tokenizer regex)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), "\\s+"))
    bpe = F.size(
        F.expr(f"regexp_extract_all({text_col}, '[A-Za-z0-9]+|[^A-Za-z0-9\\\\s]', 0)")
    )
    return docs.select(
        F.col(id_col), ws.alias("ws_tokens"), bpe.alias("bpe_tokens"),
        F.round(F.length(text_col) / F.greatest(bpe, F.lit(1)), 6).alias(
            "chars_per_token"
        ),
    )


def fingerprint(docs: DataFrame, w: int = 8, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Winnowing-lite rolling fingerprint: min md5 over char w-grams.
    Identical fingerprint ⇒ near-identical leading content; used as a cheap
    pre-cluster key before pairwise dedup."""
    return docs.select(
        F.col(id_col),
        F.array_min(
            F.transform(shingles(text_col, w), lambda s: F.md5(s))
        ).alias("fingerprint"),
    )
