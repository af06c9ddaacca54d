"""Lookup / linking joins: surface-form lookup, known-empty caching,
class-candidate joins (SURVEY.md J6/J10/J11, S11).

The reference reaches entities through external stores (SQLite label lookup
with a write-back cache /root/reference/takco/link/db/sqlite.py:341-408, a
DuckDB 3-way surface join /root/reference/takco/link/db/duckdb.py:74-86,
Elasticsearch …). The Spark-native equivalent replaces every connector with a
LOOKUP DATAFRAME joined by normalized surface key — broadcast when small —
and replaces the "-1 sentinel known-empty cache" with a left-anti join
against a known-empty key table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from takco_spark.functions.text import normalize_surface


def surface_lookup(
    mentions: DataFrame,
    lexicon: DataFrame,
    mention_col: str = "text",
    surface_col: str = "surface",
    broadcast_lexicon: bool = True,
) -> DataFrame:
    """Left-join entity candidates onto mentions by normalized surface form.

    mentions(…, mention_col) × lexicon(surface_col, entity, score) →
    mentions + (entity, score). The reference's DuckDB query joins surface →
    wiki-id → statistics (duckdb.py:74-86); here the lexicon is pre-joined
    data, broadcast if it fits.
    """
    lex = lexicon.withColumn("__key", normalize_surface(F.col(surface_col)))
    if broadcast_lexicon:
        lex = F.broadcast(lex)
    out = mentions.withColumn("__key", normalize_surface(F.col(mention_col)))
    return out.join(lex.drop(surface_col), "__key", "left").drop("__key")


def filter_lookupable(mentions: DataFrame, mention_col: str = "text") -> DataFrame:
    """Skip numeric / trivial cells before lookup (reference cell filters,
    /root/reference/takco/link/base.py:200-201: len>1 and not numeric)."""
    c = F.col(mention_col)
    return mentions.where(
        (F.length(c) > 1) & ~c.rlike(r"^[\d.,%\s-]+$")
    )


def with_known_empty_cache(
    mentions: DataFrame,
    known_empty: DataFrame,
    mention_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Split mentions into (to_lookup, skipped) using a known-empty key table
    — the join-native version of the reference's ``-1`` sentinel rows
    (sqlite.py:360-388): keys that previously returned nothing are anti-joined
    away instead of re-queried."""
    ke = F.broadcast(
        known_empty.select(normalize_surface(F.col("surface")).alias("__key")).distinct()
    )
    keyed = mentions.withColumn("__key", normalize_surface(F.col(mention_col)))
    to_lookup = keyed.join(ke, "__key", "left_anti").drop("__key")
    skipped = keyed.join(ke, "__key", "left_semi").drop("__key")
    return to_lookup, skipped


def class_candidate_join(
    left_cols: DataFrame,
    right_cols: DataFrame,
    class_col: str = "pred_class",
    score_col: str = "score",
) -> DataFrame:
    """J6: columns predicted to share a KB class become candidates with
    sim = score_l · score_r, max-aggregated per column pair (reference
    KBClassMatcher semantics, snow_pipeline.py:337-379)."""
    l = left_cols.select(
        F.col("col_id").alias("col_id_1"),
        F.col(class_col).alias("cls"),
        F.col(score_col).alias("s1"),
    )
    r = right_cols.select(
        F.col("col_id").alias("col_id_2"),
        F.col(class_col).alias("cls"),
        F.col(score_col).alias("s2"),
    )
    return (
        l.join(r, "cls")
        .where(F.col("col_id_1") < F.col("col_id_2"))
        .groupBy("col_id_1", "col_id_2")
        .agg(F.max(F.col("s1") * F.col("s2")).alias("class_sim"))
    )
