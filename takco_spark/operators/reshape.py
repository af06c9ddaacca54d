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


#: F18 pivot regexes: the reference's class-based finders
#: (NumSuffix/NumPrefix, /root/reference/takco/reshape/findpivot.py:332-347)
#: PLUS its config-registered RegexFinder family
#: (/root/reference/resources/pipelines/wikitables.toml:41-77: year-prefix,
#: year-suffix, short-uppercase-acronyms, time, sports-round). Named groups
#: become numbered groups for ``regexp_extract``; every pattern is
#: ``^``-anchored because the reference applies them with ``re.match``.
#: Entries are (pattern, var_group, val_group); group 0 (= whole match)
#: encodes the reference's rule that a pattern lacking a var or val group
#: still FINDS pivot cells but splits them to (cell, cell)
#: (findpivot.py:313-322 requires both groups, else var = val = the cell).
PIVOT_FINDERS: dict[str, tuple[str, int, int]] = {
    "num_suffix": (r"^(.*)(?:^|\s)[\W\s]*(\d[\W\d]*?)[\W\s]*$", 1, 2),
    "num_prefix": (r"^[\W\s]*(\d[\W\d]*)(?:$|\s)(.*)", 2, 1),
    "year_prefix": (
        r"^[\W\s]*([0-9]{4}(\s?[-–]\s?([0-9]{2}|[0-9]{4}|present))?)"
        r"[\W\s]*(.*?)[\W\s]*$",
        4, 1,
    ),
    "year_suffix": (
        r"^(.*?)[\W\s]*([0-9]{4}(\s?[-–]\s?([0-9]{2}|[0-9]{4}|present))?)"
        r"[\W\s]*$",
        1, 2,
    ),
    "short_uppercase_acronym": (r"^([A-Z]{3,4})$", 0, 0),
    "time": (r"^(.*?)[\W\s]*(\d{1,2}:\d{2}[AP]M).*", 1, 2),
    "sports_round": (r"^((\d+|OT|Total|Final))$", 0, 0),
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


def seq_prefix_pivots(headers: DataFrame) -> DataFrame:
    """F18 SeqPrefix finder (reference findpivot.py:349-391): per header row,
    the most common first-whitespace-token 'prefix' (count > 1) marks every
    cell that starts with it (and isn't just the prefix) as a pivot cell;
    the split is var = prefix, val = remainder.

    Input: long header grid (doc_id, row, col, text). Output: matching rows
    + (pivot_var, pivot_val). Two windows partitioned by (doc_id, row) — no
    per-doc Python (the reference's Counter loop becomes a count + top-1).
    """
    from pyspark.sql import Window

    pfx = F.expr("element_at(split(trim(text), '\\\\s+'), 1)")
    with_pfx = headers.withColumn("_pfx", pfx).where(
        F.col("_pfx").isNotNull() & (F.col("_pfx") != "")
    )
    counts = with_pfx.groupBy("doc_id", "row", "_pfx").agg(
        F.count("*").alias("_n")
    )
    w = Window.partitionBy("doc_id", "row").orderBy(
        F.desc("_n"), F.asc("_pfx")
    )
    top = (
        counts.withColumn("_rk", F.row_number().over(w))
        .where((F.col("_rk") == 1) & (F.col("_n") > 1))
        .select("doc_id", "row", F.col("_pfx").alias("_top"))
    )
    return (
        headers.join(top, ["doc_id", "row"])
        .where(
            F.col("text").startswith(F.col("_top"))
            & (F.trim("text") != F.col("_top"))
        )
        .withColumn("pivot_var", F.col("_top"))
        .withColumn(
            "pivot_val",
            F.trim(F.expr("substring(text, length(_top) + 1)")),
        )
        .drop("_top")
    )


def spanned_repeat_pivots(headers: DataFrame) -> DataFrame:
    """F18 SpannedRepeat finder (reference findpivot.py:394-448): a header
    cell is a pivot when it SPANS multiple columns (in the dense grid, a run
    of adjacent equal texts — how the S9 extractor encodes colspan) and some
    OTHER header row repeats a value (≥ 2 separate runs of one text) within
    the spanned column range.

    Input: long header grid (doc_id, row, col, text). Pure window/join
    algebra: run detection via lag, run extents via min/max over the run,
    run-level repeat counts via a distinct-runs groupBy, then a bounded
    range join per doc_id.
    """
    from pyspark.sql import Window

    wc = Window.partitionBy("doc_id", "row").orderBy("col")
    new_run = (
        F.coalesce(F.col("text") != F.lag("text").over(wc), F.lit(True))
    ).cast("int")
    runs = headers.withColumn("_run", F.sum(new_run).over(wc))
    wr = Window.partitionBy("doc_id", "row", "_run")
    cells = runs.select(
        "doc_id", "row", "col", "text", "_run",
        F.count("*").over(wr).alias("_span"),
        F.min("col").over(wr).alias("_from"),
        F.max("col").over(wr).alias("_to"),
    )
    # run-level repeats: a text that forms >= 2 separate runs in one row
    run_counts = (
        cells.select("doc_id", "row", "text", "_run").distinct()
        .groupBy("doc_id", "row", "text")
        .agg(F.count("*").alias("_nruns"))
    )
    repeat_cells = (
        cells.join(run_counts, ["doc_id", "row", "text"])
        .where((F.col("_nruns") > 1) & (F.col("text") != ""))
        .select("doc_id", F.col("row").alias("_rj"), F.col("col").alias("_cj"))
    )
    spanning = cells.where((F.col("_span") > 1) & (F.col("text") != ""))
    return (
        spanning.join(repeat_cells, "doc_id")
        .where(
            (F.col("row") != F.col("_rj"))
            & F.col("_cj").between(F.col("_from"), F.col("_to"))
        )
        .select("doc_id", "row", "col", "text")
        .distinct()
    )


def _doc_width(n_cols) -> F.Column:
    """Grid width of a span document: explicit ``n_cols`` (int or Column), or
    the single-header-row convention of the S3/S9 sources — header-span
    count, falling back to size(spans) for headerless one-row docs."""
    if n_cols is not None:
        return F.lit(n_cols) if isinstance(n_cols, int) else n_cols
    return F.coalesce(
        F.nullif(F.expr("size(filter(spans, s -> s.kind = 'header'))"), F.lit(0)),
        F.expr("size(spans)"),
    )


def max_width_guard(documents: DataFrame, max_cols: int = 100,
                    n_cols=None) -> DataFrame:
    """P3: discard documents at least ``max_cols`` columns wide — the
    reference's table-width sanity guard (tables that wide are scraping
    artifacts whose quadratic cell mass poisons downstream stages)
    (/root/reference/takco/reshape/clean.py:38-40, default max_cols=100).
    Pure Column filter; at scale this prunes before any explode."""
    return documents.where(_doc_width(n_cols) < F.lit(max_cols))


def document_grid(documents: DataFrame, n_cols=None) -> DataFrame:
    """Row-major span documents → long grid form
    (doc_id, row, col, kind, text, media_ref): the representation the
    row/column cleanup operators work on (the reference's tableData matrix,
    one Spark row per cell instead of nested lists)."""
    width = _doc_width(n_cols)
    ordered = (
        "array_sort(spans, (a, b) -> case when a.offset < b.offset then -1 "
        "when a.offset > b.offset then 1 else 0 end)"
    )
    return (
        documents.withColumn("_w", width)
        .select(
            "doc_id", "_w",
            F.posexplode(F.expr(ordered)).alias("_pos", "s"),
        )
        .select(
            "doc_id",
            F.floor(F.col("_pos") / F.col("_w")).cast("int").alias("row"),
            F.pmod(F.col("_pos"), F.col("_w")).cast("int").alias("col"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
        )
    )


def remove_empty_rows(grid: DataFrame) -> DataFrame:
    """P7a: drop grid rows whose cells are ALL empty/whitespace, renumbering
    the remaining rows densely (reference remove_empty_rows +
    remove_empty_header_rows, /root/reference/takco/reshape/clean.py:171-186
    — same predicate applied to body and header rows). One window pass for
    the keep flag, one dense_rank for renumbering — no self-join."""
    from pyspark.sql import Window

    keep = F.max(
        (F.length(F.trim(F.coalesce("text", F.lit("")))) > 0).cast("int")
    ).over(Window.partitionBy("doc_id", "row"))
    kept = grid.withColumn("_keep", keep).where(F.col("_keep") == 1).drop("_keep")
    rn = F.dense_rank().over(Window.partitionBy("doc_id").orderBy("row")) - 1
    return kept.withColumn("row", rn.cast("int"))


def remove_empty_columns(grid: DataFrame) -> DataFrame:
    """P7b: drop grid columns with no non-empty BODY cell (header text alone
    does not keep a column — reference remove_empty_columns checks tableData
    only, /root/reference/takco/reshape/clean.py:82-96), renumbering the
    surviving columns densely."""
    from pyspark.sql import Window

    body_nonempty = F.max(
        (
            (F.col("kind") != "header")
            & (F.length(F.trim(F.coalesce("text", F.lit("")))) > 0)
        ).cast("int")
    ).over(Window.partitionBy("doc_id", "col"))
    kept = (
        grid.withColumn("_keep", body_nonempty)
        .where(F.col("_keep") == 1)
        .drop("_keep")
    )
    cn = F.dense_rank().over(Window.partitionBy("doc_id").orderBy("col")) - 1
    return kept.withColumn("col", cn.cast("int"))


def grid_to_documents(grid: DataFrame) -> DataFrame:
    """Long grid form → row-major span documents (offsets re-based 0..n-1);
    inverse of :func:`document_grid` for dense grids."""
    return (
        grid.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("row", "col", "kind", "text", "media_ref"))
            ).alias("cells")
        )
        .select(
            "doc_id",
            F.expr(
                "transform(cells, (c, i) -> struct(c.kind as kind, c.text as text,"
                " c.media_ref as media_ref, cast(i as int) as offset))"
            ).alias("spans"),
        )
    )


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
