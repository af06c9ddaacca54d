"""Text analysis over flat document tables: quality scoring, language-ID
heuristic, token counting, fingerprinting (training-data pipeline ops).

Everything is JVM-side Column algebra — zero Python in these paths — and each
op has an exact ANSI-SQL twin in ``__spark_entry__.oracle_sql`` so the DuckDB
oracle verifies it value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in")
MARKERS = {
    "en": ("the", "a", "of", "and"),
    "fr": ("le", "la", "et", "de"),
    "de": ("der", "die", "und", "das"),
}

#: BPE-ish token regex: alpha runs, digit runs, or single non-space symbol.
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def text_quality(documents: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Per-doc quality features: token count, char count, alpha ratio,
    stop-word ratio, mean token length. (Quality-filter features for a
    training-data pipeline; rounding fixed for oracle parity.)"""
    t = F.lower(F.col(text_col))
    tokens = F.split(t, r"\s+")
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS_EN)
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens).alias("n_tokens"),
        F.length(t).alias("n_chars"),
        F.round(
            F.length(F.regexp_replace(t, r"[^a-z]", "")) / F.length(t), 6
        ).alias("alpha_ratio"),
        F.round(
            F.size(F.expr(f"filter(split(lower({text_col}), '\\\\s+'), x -> x in ({stop_list}))"))
            / F.size(tokens),
            6,
        ).alias("stopword_ratio"),
        F.round(
            F.length(F.regexp_replace(t, r"\s", "")) / F.size(tokens), 6
        ).alias("mean_token_len"),
    )


def token_count_bpe(documents: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Token counts: whitespace tokens and BPE-ish regex tokens."""
    t = F.lower(F.col(text_col))
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(t, r"\s+")).alias("ws_tokens"),
        F.size(
            F.expr(
                # Spark SQL string literals eat single backslashes — escape
                # the regex for the literal context
                f"regexp_extract_all(lower({text_col}), '{BPE_TOKEN_RE.replace(chr(92), chr(92) * 2)}', 0)"
            )
        ).alias("bpe_tokens"),
    )


def lang_guess(documents: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Marker-token language heuristic: count stop-word hits per language
    profile; highest count wins ('und' on ties/zero). An n-gram profile model
    would drop in the same shape (scores per language → argmax)."""
    toks = F.expr(f"split(lower({text_col}), '\\\\s+')")
    scores = {}
    for lang, markers in MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        scores[lang] = F.size(
            F.expr(f"filter(split(lower({text_col}), '\\\\s+'), x -> x in ({lst}))")
        )
    en, fr, de = scores["en"], scores["fr"], scores["de"]
    guess = (
        F.when((en > fr) & (en > de), F.lit("en"))
        .when((fr > en) & (fr > de), F.lit("fr"))
        .when((de > en) & (de > fr), F.lit("de"))
        .otherwise(F.lit("und"))
    )
    return documents.select(
        F.col(id_col).alias("doc_id"), guess.alias("lang_guess"),
        en.alias("en_hits"), fr.alias("fr_hits"), de.alias("de_hits"),
    )


def fingerprint(documents: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text plus a
    64-bit xxhash (cheap join key for dedup)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\W", "")
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm).alias("fingerprint"),
        F.xxhash64(norm).alias("fingerprint64"),
    )
