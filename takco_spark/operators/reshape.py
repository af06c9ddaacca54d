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


def _lcs_blocks(a: str, b: str, min_block: int) -> list[str]:
    """Ordered common substrings of ``a`` and ``b``, each ≥ ``min_block``
    chars: longest-common-substring divide-and-conquer (the algorithm behind
    the reference's ``templater`` dependency). O(|a|·|b|) DP per level —
    cells are short strings, groups are table columns, so this is bounded.
    """
    if len(a) < min_block or len(b) < min_block:
        return []
    best_len = best_a = best_b = 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        ai = a[i - 1]
        for j in range(1, len(b) + 1):
            if ai == b[j - 1]:
                v = prev[j - 1] + 1
                cur[j] = v
                if v > best_len:
                    best_len, best_a, best_b = v, i, j
        prev = cur
    if best_len < min_block:
        return []
    left = _lcs_blocks(a[: best_a - best_len], b[: best_b - best_len], min_block)
    right = _lcs_blocks(a[best_a:], b[best_b:], min_block)
    return left + [a[best_a - best_len : best_a]] + right


def _learn_template(texts: list[str], min_block: int) -> list[str]:
    """Fold :func:`_lcs_blocks` over a column: static blocks every cell
    contains, in order (reference ``Templater.learn`` loop,
    /root/reference/takco/reshape/compound.py:152-160)."""
    if len(texts) < 2:
        return []
    blocks = _lcs_blocks(texts[0], texts[1], min_block)
    for s in texts[2:]:
        if not blocks:
            return []
        out: list[str] = []
        pos = 0
        for blk in blocks:
            i = s.find(blk, pos)
            if i >= 0:
                out.append(blk)
                pos = i + len(blk)
            else:
                for sub in _lcs_blocks(blk, s[pos:], min_block):
                    j = s.find(sub, pos)
                    if j >= 0:
                        out.append(sub)
                        pos = j + len(sub)
        blocks = out
    return blocks


def _parse_template(blocks: list[str], s: str) -> list[str] | None:
    """Split ``s`` on the static blocks in order → the variable gap contents
    (len(blocks)+1 parts), or None if a block is missing (reference
    ``Templater.parse``)."""
    parts: list[str] = []
    pos = 0
    for blk in blocks:
        i = s.find(blk, pos)
        if i < 0:
            return None
        parts.append(s[pos:i])
        pos = i + len(blk)
    parts.append(s[pos:])
    return parts


def template_compound_split(
    cells: DataFrame,
    group_col: str = "col",
    id_col: str = "row",
    text_col: str = "text",
    min_block_size: int = 2,
    min_cell_size: int | None = None,
    max_cell_size: int | None = None,
) -> DataFrame:
    """F17 TemplateCompoundSplitter (reference
    /root/reference/takco/reshape/compound.py:129-185): learn the common
    static blocks of a column's cell texts, split every cell on them, and
    emit one output row per (cell, variable part) whose column of parts
    passes the reference's ``col_is_ok`` gate (some non-empty; optional
    min/max part length over ALL cells). ``part`` is the static block
    preceding the gap — a numeric block is re-prepended to the values and the
    part named by its index, exactly the reference's numeric-prefix rule
    (:168-174).

    Output: (group, id, part, value) long format.

    Scale: one ``applyInPandas`` per column group — a group is one table
    column (bounded by table height), so the Arrow batch and the O(|a|·|b|)
    template DP are bounded regardless of corpus size; corpus-level
    parallelism is across groups. The reference runs the same per-column
    loop single-threaded.
    """
    import pandas as pd
    from pyspark.sql.types import StructField, StructType, StringType

    in_schema = {f.name: f for f in cells.schema.fields}
    out_schema = StructType([
        StructField("grp", in_schema[group_col].dataType, True),
        StructField("id", in_schema[id_col].dataType, True),
        StructField("part", StringType(), True),
        StructField("value", StringType(), True),
    ])

    def split_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        texts = ["" if t is None else str(t) for t in pdf[text_col]]
        empty = pd.DataFrame({"grp": [], "id": [], "part": [], "value": []})
        blocks = _learn_template(texts, min_block_size)
        if not blocks:
            return empty
        parsed = [_parse_template(blocks, t) for t in texts]
        if any(p is None for p in parsed):
            return empty
        grp_val = pdf[group_col].iloc[0]
        ids = list(pdf[id_col])
        rows = []
        for gi in range(len(blocks) + 1):
            vals = [p[gi].strip() for p in parsed]  # type: ignore[index]
            if not any(vals):
                continue
            if min_cell_size is not None and any(
                len(v) < min_cell_size for v in vals
            ):
                continue
            if max_cell_size is not None and any(
                len(v) > max_cell_size for v in vals
            ):
                continue
            part = blocks[gi - 1].strip() if gi > 0 else ""
            if part and part.isnumeric():
                vals = [part + v for v in vals]
                part = str(gi)
            elif not part:
                part = str(gi)
            rows.extend((grp_val, i, part, v) for i, v in zip(ids, vals))
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=["grp", "id", "part", "value"])

    return cells.groupBy(group_col).applyInPandas(split_group, out_schema)


def attribute_context_pivots(
    headers: DataFrame,
    doc_attrs: DataFrame,
    att_col: str = "att",
    text_col: str = "text",
) -> DataFrame:
    """F18 AttributeContext finder (reference
    /root/reference/takco/reshape/findpivot.py:529-560): the *build* phase
    collects header-cell texts that case-insensitively equal some document's
    context attribute (e.g. its page title); *find* marks every header cell
    whose text is in that collected value set — across ALL documents, because
    the reference merges built finders corpus-wide (``merge``, :546-549).

    ``headers``: long header grid (doc_id, row, col, text).
    ``doc_attrs``: (doc_id, att) — one context attribute value per document.

    Spark-first: build = an equi-join of the grid against its own doc
    attribute on lower(text) == lower(att) (one shuffle, then a distinct on
    the tiny survivor set); find = a broadcast semi-join of the grid against
    that value set. The reference's driver-side ``set`` + two nested loops
    become two joins; no collect.
    """
    att = F.lower(F.trim(F.col(att_col)))
    values = (
        headers.join(doc_attrs.select("doc_id", att.alias("_att")), "doc_id")
        .where(
            (F.length(F.col(text_col)) > 1)
            & (F.lower(F.col(text_col)) == F.col("_att"))
        )
        .select(F.col(text_col).alias("_val"))
        .distinct()
    )
    return headers.join(
        F.broadcast(values), F.col(text_col) == F.col("_val"), "left_semi"
    )


def rule_pivots(
    headers: DataFrame,
    id_vars: list[str] | None = None,
    value_vars: list[str] | None = None,
) -> DataFrame:
    """F18 Rule finder (reference findpivot.py:561-583): a header row where
    every ``id_vars`` entry AND every ``value_vars`` entry appears yields as
    pivot cells the ``value_vars`` cells — or, when ``value_vars`` is empty,
    every cell NOT in ``id_vars``.

    Input: long header grid (doc_id, row, col, text). Pure conditional
    aggregation: per (doc_id, row), ``bool_and`` of per-var ``bool_or``
    presence flags, then a row-level filter — the reference's per-row
    ``all(v in hrow ...)`` loops as one groupBy + join.
    """
    id_vars = list(id_vars or [])
    value_vars = list(value_vars or [])
    if not id_vars and not value_vars:
        return headers.limit(0)
    presence = [
        F.max((F.col("text") == F.lit(v)).cast("int")).alias(f"_p{i}")
        for i, v in enumerate(id_vars + value_vars)
    ]
    all_present = None
    for i in range(len(id_vars) + len(value_vars)):
        flag = F.col(f"_p{i}") == 1
        all_present = flag if all_present is None else (all_present & flag)
    ok_rows = (
        headers.groupBy("doc_id", "row").agg(*presence)
        .where(all_present)
        .select("doc_id", "row")
    )
    matched = headers.join(ok_rows, ["doc_id", "row"], "left_semi")
    if value_vars:
        return matched.where(F.col("text").isin(value_vars))
    return matched.where(~F.col("text").isin(id_vars))


def agent_like_pivots(
    header_links: DataFrame,
    kb_classes: DataFrame,
    entity_facts: DataFrame,
    id_types: list[str] | None = None,
    id_props: list[str] | None = None,
) -> DataFrame:
    """F18 AgentLikeHyperlink finder (reference findpivot.py:451-528): a
    header cell whose linked entities are all *agent-like* is a pivot cell.
    An entity is attribute-like (NOT agent-like) when (a) it is used as a
    class (something has it as a type), (b) it has an attribute-like type
    (disambiguation/list/unit pages), or (c) it has an attribute-like
    property. Cells with no links never match (the reference requires
    ``es`` non-empty).

    ``header_links``: (doc_id, row, col, entity) — one row per cell↔entity
    link (J6/S11 lookup-join output feeds this).
    ``kb_classes``: (entity, cls) type assertions; an entity *used as* a
    class appears in the ``cls`` column.
    ``entity_facts``: (s, p) subject–property pairs for rule (c).

    Spark-first: the reference's three per-entity SPARQL count() probes
    become three broadcast/semi-join flags against the (small, dimension-
    sized) KB tables, aggregated per cell with ``every()``. No driver loop,
    no per-entity round trips.
    """
    id_types = list(id_types or [])
    id_props = list(id_props or [])
    used_as_class = kb_classes.select(F.col("cls").alias("entity")).distinct()
    has_id_type = (
        kb_classes.where(F.col("cls").isin(id_types))
        .select("entity").distinct()
        if id_types else None
    )
    has_id_prop = (
        entity_facts.where(F.col("p").isin(id_props))
        .select(F.col("s").alias("entity")).distinct()
        if id_props else None
    )
    attr_like = used_as_class
    if has_id_type is not None:
        attr_like = attr_like.unionByName(has_id_type)
    if has_id_prop is not None:
        attr_like = attr_like.unionByName(has_id_prop)
    attr_like = attr_like.distinct().withColumn("_is_attr", F.lit(True))
    flagged = header_links.join(F.broadcast(attr_like), "entity", "left")
    return (
        flagged.groupBy("doc_id", "row", "col")
        .agg(
            F.every(F.col("_is_attr").isNull()).alias("_all_agent"),
            F.count("*").alias("_n_links"),
        )
        .where(F.col("_all_agent") & (F.col("_n_links") > 0))
        .select("doc_id", "row", "col")
    )
