"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen); nothing here drops to Python. Each operator has a
DuckDB-expressible equivalent so the driver's oracle gate covers it.

- token counting: whitespace tokens + a BPE-ish regex token count
- quality scoring: length / punctuation / stopword / word-length ratios
- language ID: stopword-hit-ratio n-gram heuristic (deterministic)
- document fingerprinting: md5 over whitespace-normalized text
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from yaii_spark.analyzer import STOPWORDS

# BPE-ish: runs of letters, runs of digits, or single non-space symbols
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# small, fixed per-language stopword probe sets for the lang-id heuristic
LANG_PROBES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "no"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
    "de": ["der", "die", "und", "das", "nicht", "von", "sie", "ist", "des", "ein"],
}


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens with empties dropped (split on \\s+ after trim)."""
    return F.split(F.trim(text), r"\s+")


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        df.withColumn("n_ws_tokens", F.size(ws_tokens(t)))
        .withColumn(
            "n_bpe_tokens",
            F.size(F.regexp_extract_all(F.lower(t), F.lit(BPE_ISH_PATTERN), 0)),
        )
        .withColumn("n_chars_calc", F.length(t))
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score, all JVM-side."""
    t = F.col(text_col)
    toks = ws_tokens(t)
    n_tok = F.size(toks)
    stop_arr = F.array([F.lit(s) for s in sorted(STOPWORDS - {""})])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    avg_wlen = (F.length(F.regexp_replace(t, r"\s+", "")) / n_tok)
    out = (
        df.withColumn("n_tokens", n_tok)
        .withColumn("stopword_ratio", F.round(n_stop / F.greatest(n_tok, F.lit(1)), 6))
        .withColumn("punct_ratio", F.round(n_punct / F.greatest(F.length(t), F.lit(1)), 6))
        .withColumn("avg_word_len", F.round(avg_wlen, 6))
    )
    score = (
        F.least(F.col("n_tokens") / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio") * F.lit(4.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(F.col("punct_ratio") * F.lit(10.0), F.lit(1.0))) * 0.3
    )
    return out.withColumn("quality_score", F.round(score, 6))


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stopword-probe language ID; 'und' when no probe hits.

    argmax over per-language hit counts, ties broken by language code —
    expressible identically in SQL, so the oracle gate covers it.
    """
    toks = F.array_distinct(ws_tokens(F.lower(F.col(text_col))))
    hits = [
        F.struct(
            (-F.size(F.array_intersect(toks, F.array([F.lit(w) for w in probes])))).alias("neg_hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, probes in sorted(LANG_PROBES.items())
    ]
    # argmax hits, ties → lexicographically smallest language code:
    # ascending sort on (-hits, lang), take head
    best = F.sort_array(F.array(hits))[0]
    return df.withColumn(
        "lang_pred",
        F.when(best["neg_hits"] < 0, best["lang"]).otherwise(F.lit("und")),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized-text content fingerprint (md5 of lower+ws-collapsed)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(norm))
