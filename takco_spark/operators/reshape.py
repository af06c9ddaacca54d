"""Reshape operators: compound splitting (F17), pivot finders (F18),
transpose heuristic (F20).

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


#: F18 pivot regexes (reference NumSuffix/NumPrefix,
#: /root/reference/takco/reshape/findpivot.py:332-347 — named groups become
#: numbered groups for regexp_extract): (pattern, var_group, val_group)
PIVOT_FINDERS: dict[str, tuple[str, int, int]] = {
    "num_suffix": (r"(.*)(?:^|\s)[\W\s]*(\d[\W\d]*?)[\W\s]*$", 1, 2),
    "num_prefix": (r"[\W\s]*(\d[\W\d]*)(?:$|\s)(.*)", 2, 1),
}


def find_pivot_cells(headers: DataFrame, finder: str = "num_suffix",
                     text_col: str = "text") -> DataFrame:
    """F18: regex pivot finder over header cells.

    headers(..., text) → matching rows with extracted (pivot_var, pivot_val)
    columns — the split that drives the unpivot (reference
    RegexFinder.find_pivot_cells + split_header,
    /root/reference/takco/reshape/findpivot.py:280-330): a header like
    'sales 2004' splits into var='sales' (new header) and val='2004' (a
    value of the unpivoted variable). Pure ``regexp_extract`` projection.
    """
    if finder not in PIVOT_FINDERS:
        raise ValueError(f"unknown pivot finder {finder!r}")
    pattern, var_g, val_g = PIVOT_FINDERS[finder]
    t = F.trim(F.col(text_col))
    matched = headers.where(t.rlike(pattern))
    return matched.withColumn(
        "pivot_var", F.trim(F.regexp_extract(t, pattern, var_g))
    ).withColumn("pivot_val", F.trim(F.regexp_extract(t, pattern, val_g)))


def heuristic_transpose(documents: DataFrame) -> DataFrame:
    """F20: transpose 1×2 tables (reference heuristic_transpose,
    /root/reference/takco/reshape/clean.py:327-339): a document whose spans
    are exactly [header h1, header h2, cell a, cell b] (one data row, two
    columns) becomes the two-row key-value layout
    [h1, a, h2, b] — all spans demoted to 'cell' (n_header_rows=0), offsets
    re-based. Everything else passes through untouched. Pure Column algebra.
    """
    ordered = (
        "array_sort(spans, (a, b) -> case when a.offset < b.offset then -1 "
        "when a.offset > b.offset then 1 else 0 end)"
    )
    is_1x2 = F.expr(
        f"size(spans) = 4 AND size(filter({ordered}, s -> s.kind = 'header')) = 2"
        f" AND size(filter({ordered}, s -> s.kind = 'cell')) = 2"
    )
    transposed = F.expr(f"""
      transform(
        array(element_at(filter({ordered}, s -> s.kind = 'header'), 1),
              element_at(filter({ordered}, s -> s.kind = 'cell'), 1),
              element_at(filter({ordered}, s -> s.kind = 'header'), 2),
              element_at(filter({ordered}, s -> s.kind = 'cell'), 2)),
        (s, i) -> named_struct('kind', 'cell', 'text', s.text,
                               'media_ref', s.media_ref,
                               'offset', cast(i as int)))
    """)
    return documents.withColumn(
        "spans", F.when(is_1x2, transposed).otherwise(F.col("spans"))
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
