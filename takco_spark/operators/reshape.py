"""Compound-column splitting (SURVEY.md F17).

Reference: Suffix/PrefixCompoundSplitter
(/root/reference/takco/reshape/compound.py:97-125) — per column, find the
common suffix/prefix of the cell texts; when it covers > half the cells,
strip it into a new column and record the affix.

Spark-first trick: the common prefix of an ENTIRE group equals the common
prefix of its lexicographic MIN and MAX strings — so the group-wide affix
comes from one groupBy(min, max) plus the JVM ``common_prefix`` length
expression. No collect, no per-group Python; suffix mode runs the same
algebra on reversed strings. (The reference's ``os.path.commonprefix`` over
all cells is the same function computed sequentially.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from takco_spark.functions.tolerance import common_prefix


def compound_affixes(cells: DataFrame, group_col: str = "col",
                     text_col: str = "text", mode: str = "suffix",
                     min_cover: float = 0.5) -> DataFrame:
    """(group, text) → (group, affix, n_rows, cover) for groups whose common
    affix is non-empty and covers > min_cover of the rows.

    ``cover`` is the fraction of rows carrying the affix — by construction
    of the min/max trick it is 1.0 whenever affix != '' (kept as an output
    column for parity with the reference's explicit cover check).
    """
    if mode not in ("prefix", "suffix"):
        raise ValueError(f"unknown mode {mode!r}")
    t = F.col(text_col) if mode == "prefix" else F.reverse(F.col(text_col))
    agg = cells.groupBy(F.col(group_col).alias("grp")).agg(
        F.min(t).alias("lo"), F.max(t).alias("hi"), F.count("*").alias("n_rows")
    )
    cp_len = common_prefix(F.col("lo"), F.col("hi"))
    affix_fwd = F.substring(F.col("lo"), 1, cp_len)
    affix = affix_fwd if mode == "prefix" else F.reverse(affix_fwd)
    with_affix = agg.select("grp", affix.alias("affix"), "n_rows").where(
        F.length("affix") > 0
    )
    matcher = (
        F.col(text_col).startswith(F.col("affix"))
        if mode == "prefix"
        else F.col(text_col).endswith(F.col("affix"))
    )
    cover = (
        cells.join(F.broadcast(with_affix),
                   F.col(group_col) == F.col("grp"))
        .groupBy("grp", "affix", "n_rows")
        .agg((F.sum(matcher.cast("int")) / F.count("*")).alias("cover"))
    )
    return cover.where(F.col("cover") > min_cover).select(
        "grp", "affix", "n_rows", "cover"
    )


def compound_split(cells: DataFrame, group_col: str = "col",
                   text_col: str = "text", mode: str = "suffix",
                   min_cover: float = 0.5) -> DataFrame:
    """Apply :func:`compound_affixes`: rows in qualifying groups get a
    ``stripped`` column with the affix removed from the matching END of the
    string (the reference's ``str.replace`` removes any occurrence — here
    only the anchored affix is stripped, the well-defined variant); rows in
    other groups pass through with stripped = text and affix = ''."""
    affixes = compound_affixes(cells, group_col, text_col, mode, min_cover)
    joined = cells.join(
        F.broadcast(affixes.select("grp", "affix")),
        F.col(group_col) == F.col("grp"),
        "left",
    ).drop("grp")
    a = F.coalesce(F.col("affix"), F.lit(""))
    t = F.col(text_col)
    if mode == "prefix":
        stripped = F.when(
            (F.length(a) > 0) & t.startswith(a),
            F.substring(t, F.length(a) + 1, F.length(t)),
        ).otherwise(t)
    else:
        stripped = F.when(
            (F.length(a) > 0) & t.endswith(a),
            F.substring(t, 1, F.length(t) - F.length(a)),
        ).otherwise(t)
    return joined.withColumn("affix", a).withColumn("stripped", stripped)
