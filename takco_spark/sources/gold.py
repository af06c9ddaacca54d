"""Gold-dataset loaders (SURVEY.md S10): the TabEL / Bhagavatula JSON table
format, the WDC-web-tables family's interchange shape.

Reference: WebDataCommons / TabEL tables are one JSON object per line with
``tableHeaders`` / ``tableData`` as row-major grids of cell objects
``{text, surfaceLinks: [{offset, endOffset, surface, target: {title, id}}]}``
(/root/reference/takco/evaluate/dataset/wdc.py:27-73; exemplar shape:
/root/reference/resources/pivot-annotation-precision.json). The reference
parses each line driver-side into its Table object; gold entity annotations
ARE the surfaceLink targets.

Spark shape: ``spark.read.json`` with an EXPLICIT partial schema — the JSON
scan prunes every field we don't name (no driver-side parsing, no Python),
then one pure-Column projection lifts each table into the span-document
model: header cells → kind='header', linked data cells → 'mention' with
``media_ref`` = first link target title (the typed-link slot, exactly how
the S9 HTML extractor maps <a href>), plain cells → 'cell'; spans are
row-major with re-based offsets. Gold mention labels come back out with
:func:`gold_mentions` — a filter over the exploded spans, no side table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the fields we read from TabEL JSON — everything else is pruned at the scan
TABEL_SCHEMA = (
    "_id string, pgId string, pgTitle string, tableId long, "
    "numCols int, numDataRows int, numHeaderRows int, "
    "tableHeaders array<array<struct<text:string, "
    "surfaceLinks:array<struct<offset:int, endOffset:int, surface:string, "
    "target:struct<id:bigint, title:string>>>>>>, "
    "tableData array<array<struct<text:string, "
    "surfaceLinks:array<struct<offset:int, endOffset:int, surface:string, "
    "target:struct<id:bigint, title:string>>>>>>"
)


def tabel_to_documents(tables: DataFrame) -> DataFrame:
    """TabEL table rows (TABEL_SCHEMA shape) → span documents.

    doc_id = ``_id`` when present, else ``<pgTitle|pgId>#t<tableId>``.
    Span order is row-major across header rows then data rows (the grid
    order every other source uses); kinds: header / mention (has a
    surfaceLink) / cell; media_ref = first link's target title.
    """
    header_cells = F.expr("flatten(coalesce(tableHeaders, array()))")
    data_cells = F.expr("flatten(coalesce(tableData, array()))")
    doc_id = F.coalesce(
        F.col("_id"),
        F.concat_ws(
            "#t",
            F.coalesce(F.col("pgTitle"), F.col("pgId"), F.lit("tabel")),
            F.coalesce(F.col("tableId"), F.lit(0)).cast("string"),
        ),
    )
    with_cells = tables.select(
        doc_id.alias("doc_id"),
        header_cells.alias("_h"),
        data_cells.alias("_d"),
    )
    spans = F.expr("""
      transform(
        concat(
          transform(_h, c -> struct(
            'header' as kind, coalesce(c.text, '') as text,
            coalesce(c.surfaceLinks[0].target.title, '') as media_ref)),
          transform(_d, c -> struct(
            CASE WHEN size(coalesce(c.surfaceLinks, array())) > 0
                 THEN 'mention' ELSE 'cell' END as kind,
            coalesce(c.text, '') as text,
            coalesce(c.surfaceLinks[0].target.title, '') as media_ref))),
        (s, i) -> struct(s.kind as kind, s.text as text,
                         s.media_ref as media_ref, cast(i as int) as offset))
    """)
    return with_cells.select("doc_id", spans.alias("spans"))


def read_tabel(spark: SparkSession, path: str) -> DataFrame:
    """S10: TabEL/WDC JSON-lines table dump → span documents.

    One JSON table object per line (the Bhagavatula dump layout the
    reference's WDC loader consumes line-by-line, wdc.py:31-33). The scan
    carries the explicit partial schema, so Spark never materializes the
    fields we don't use (tdHtmlString, textTokens, ...).
    """
    return tabel_to_documents(spark.read.schema(TABEL_SCHEMA).json(path))


# --------------------------------------------------------------------------
# T2D v2 (the gold-standard web-table annotation corpus layout)
# Reference: /root/reference/takco/evaluate/dataset/t2d.py:12-215 —
#   tables/        one JSON per table, "relation" = COLUMN-major grid
#   instance/      one CSV per table: (entity_uri, celltext, rownum)
#   property/      one CSV per table: (property_uri, header, iskey, colnum)
#   classes_GS.csv               rows: (table_fname, label, class_uri)
# --------------------------------------------------------------------------

def _t2d_name(col: F.Column) -> F.Column:
    """Table name = file stem before the first dot (reference get_name)."""
    return F.element_at(
        F.split(F.element_at(F.split(col, "/"), -1), r"\."), 1
    )


def t2d_fix_uri(col) -> F.Column:
    """The SQL-expressible core of the reference's fix_uri
    (t2d.py:96-111): percent-decode and normalize the dbpedia host/path
    variants. (The reference additionally html-unescapes and re-quotes the
    resource part with a custom safe-set — Python-specific cosmetics we
    document out; gold joins compare like-normalized URIs on both sides.)"""
    c = F.col(col) if isinstance(col, str) else col
    c = F.url_decode(c)
    c = F.replace(c, F.lit("dbpedia_org"), F.lit("dbpedia.org"))
    return F.replace(c, F.lit("/page/"), F.lit("/resource/"))


def read_t2d_tables(spark: SparkSession, tabledir: str) -> DataFrame:
    """S10: T2D v2 ``tables/*.json`` → span documents.

    Each file is ONE JSON object whose ``relation`` is a column-major grid
    (the reference transposes with ``zip(*...)``, t2d.py:113-116); here the
    transpose is array algebra on the scan output. Row 0 becomes the header
    row (reference default numheaderrows=1). Distributed: one task per file
    group, no driver-side parsing.
    """
    raw = (
        spark.read.schema("relation array<array<string>>")
        .option("multiLine", "true")
        .json(tabledir)
        .select(
            _t2d_name(F.input_file_name()).alias("doc_id"), "relation"
        )
        .where(F.expr("size(relation) > 0"))
    )
    # transpose column-major relation → row-major cells, then spans
    spans = F.expr("""
      transform(
        flatten(transform(sequence(0, size(relation[0]) - 1), i ->
          transform(sequence(0, size(relation) - 1), j ->
            struct(i as r, relation[j][i] as t)))),
        (c, k) -> struct(
          CASE WHEN c.r = 0 THEN 'header' ELSE 'cell' END as kind,
          coalesce(c.t, '') as text, '' as media_ref, cast(k as int) as offset))
    """)
    return raw.select("doc_id", spans.alias("spans"))


def read_t2d_entity_gold(spark: SparkSession, instancedir: str) -> DataFrame:
    """T2D ``instance/*.csv`` → (doc_id, row, entity, celltext): row-level
    entity gold for the table's key column (reference get_table_entities,
    t2d.py:195-215; rownum is 1-based-including-header → −1)."""
    raw = spark.read.csv(instancedir, schema="uri string, celltext string, rownum int")
    return raw.select(
        _t2d_name(F.input_file_name()).alias("doc_id"),
        (F.col("rownum") - 1).alias("row"),
        t2d_fix_uri("uri").alias("entity"),
        "celltext",
    ).where(F.col("entity").isNotNull())


def read_t2d_property_gold(spark: SparkSession, propdir: str) -> DataFrame:
    """T2D ``property/*.csv`` → (doc_id, col, property, header, is_key):
    column-level property gold (reference get_table_properties /
    get_table_keycol_from_props, t2d.py:120-165)."""
    raw = spark.read.csv(
        propdir, schema="uri string, header string, iskey string, colnum int"
    )
    return raw.select(
        _t2d_name(F.input_file_name()).alias("doc_id"),
        F.col("colnum").alias("col"),
        t2d_fix_uri("uri").alias("property"),
        "header",
        (F.lower(F.coalesce("iskey", F.lit(""))) == "true").alias("is_key"),
    ).where(F.col("property").isNotNull())


def read_t2d_classes(spark: SparkSession, classfile: str) -> DataFrame:
    """T2D ``classes_GS.csv`` → (doc_id, label, class): table-level class
    gold (reference get_table_class, t2d.py:166-180)."""
    raw = spark.read.csv(classfile, schema="fname string, label string, uri string")
    return raw.select(
        _t2d_name(F.col("fname")).alias("doc_id"),
        "label",
        t2d_fix_uri("uri").alias("class"),
    ).where(F.col("class").isNotNull())


# --------------------------------------------------------------------------
# SemTab (the ISWC semantic-table-annotation challenge layout)
# Reference: /root/reference/takco/evaluate/dataset/semtab.py:17-69 —
#   tables/*.csv     one table per file, row 0 = header, rest data
#   entity columns   = columns where LESS than half the cells match the
#                      numeric regex ^[\d.,\-\+\%]+$ (ISNUMBER, semtab.py:18)
#   CEA/CTA/CPA      target + annotation CSVs: (table, row, col[, uri]) /
#                      (table, col[, uri]) / (table, fromcol, tocol[, uri])
#                      (semtab.py:87-101,115-128,140-153)
# --------------------------------------------------------------------------

#: the reference's ISNUMBER regex (semtab.py:18), RE2-compatible
SEMTAB_ISNUMBER = r"^[0-9.,\-\+\%]+$"


def read_semtab_tables(spark: SparkSession, tabledir: str) -> DataFrame:
    """S10: SemTab ``tables/*.csv`` → span documents.

    Each file is one table (reference Semtab.tables, semtab.py:27-45): row 0
    becomes the header row, the rest data rows. Delegates to the S3 per-file
    CSV source (order-preserving mapInPandas parse); doc_id is the file stem
    before the first dot (reference get_name, semtab.py:20-21).
    """
    from takco_spark.sources.readers import read_csv_tables

    docs = read_csv_tables(spark, tabledir, header=True)
    return docs.select(_t2d_name(F.col("doc_id")).alias("doc_id"), "spans")


def semtab_entity_columns(documents: DataFrame) -> DataFrame:
    """Entity-column detection → (doc_id, col, n_cells, n_numeric, is_entity).

    Reference semantics (semtab.py:32-36): a column is an entity column when
    FEWER than half its cells (header included — the reference zips over all
    ``rows``) match ISNUMBER. Column index is recovered from the row-major
    span offsets as ``offset % ncols`` with ncols = header-span count; pure
    Column algebra, one shuffle (the per-column groupBy).
    """
    ncols = F.size(F.filter("spans", lambda s: s["kind"] == F.lit("header")))
    cells = documents.select(
        "doc_id",
        F.greatest(ncols, F.lit(1)).alias("_nc"),
        F.explode("spans").alias("s"),
    ).select(
        "doc_id",
        F.pmod(F.col("s.offset"), F.col("_nc")).cast("int").alias("col"),
        F.col("s.text").rlike(SEMTAB_ISNUMBER).cast("long").alias("_isnum"),
    )
    return cells.groupBy("doc_id", "col").agg(
        F.count("*").alias("n_cells"),
        F.sum("_isnum").alias("n_numeric"),
    ).select(
        "doc_id", "col", "n_cells", "n_numeric",
        (F.col("n_numeric") < F.col("n_cells") / 2).alias("is_entity"),
    )


def read_semtab_cea(spark: SparkSession, path: str) -> DataFrame:
    """CEA target/annotation CSV → (doc_id, row, col, entity). The uri column
    is empty/absent in target files ("3 or 4 columns", semtab.py:87-96); rows
    are 1-based-including-header in the challenge format, kept as-is (the
    reference converts at export, semtab.py:97)."""
    raw = spark.read.csv(path, schema="table string, ri int, ci int, uri string")
    return raw.select(
        F.col("table").alias("doc_id"),
        F.col("ri").alias("row"),
        F.col("ci").alias("col"),
        F.coalesce("uri", F.lit("")).alias("entity"),
    )


def read_semtab_cta(spark: SparkSession, path: str) -> DataFrame:
    """CTA target/annotation CSV → (doc_id, col, class) (semtab.py:115-128)."""
    raw = spark.read.csv(path, schema="table string, ci int, uri string")
    return raw.select(
        F.col("table").alias("doc_id"),
        F.col("ci").alias("col"),
        F.coalesce("uri", F.lit("")).alias("class"),
    )


def read_semtab_cpa(spark: SparkSession, path: str) -> DataFrame:
    """CPA target/annotation CSV → (doc_id, from_col, to_col, property)
    (semtab.py:140-153)."""
    raw = spark.read.csv(
        path, schema="table string, fromci int, toci int, uri string"
    )
    return raw.select(
        F.col("table").alias("doc_id"),
        F.col("fromci").alias("from_col"),
        F.col("toci").alias("to_col"),
        F.coalesce("uri", F.lit("")).alias("property"),
    )


def to_cea_annotations(predictions: DataFrame, targets: DataFrame) -> DataFrame:
    """Prediction votes → one CEA annotation row per target cell.

    ``predictions``: (doc_id, row, col, entity) — one row per VOTE (the
    reference's per-cell Counter, semtab.py:97-101). ``targets``: the CEA
    target table (read_semtab_cea). Output keeps the target's (doc_id, row,
    col) and the majority entity; targets with no prediction are dropped,
    matching the reference's annotated/total accounting. Tie-break is
    lexicographic-min entity (deterministic; the reference inherits dict
    order). One groupBy + one broadcast-able join; W3 top-1 pattern.
    """
    from pyspark.sql import Window

    votes = predictions.where(F.col("entity") != "").groupBy(
        "doc_id", "row", "col", "entity"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("doc_id", "row", "col").orderBy(
        F.col("n").desc(), "entity"
    )
    best = votes.withColumn("_rk", F.row_number().over(w)).where(
        F.col("_rk") == 1
    ).select("doc_id", "row", "col", "entity")
    return targets.select("doc_id", "row", "col").join(
        best, ["doc_id", "row", "col"], "inner"
    )


# --------------------------------------------------------------------------
# ToughTables (2T / 2T_WD — the SemTab-2020 hard split)
# Reference: /root/reference/takco/evaluate/dataset/toughtables.py:15-94 —
#   tables/*.csv in the SemTab layout; gt/CEA_{part}_gt.csv rows are
#   (table, col, row, entities) with SPACE-separated multi-entity cells and
#   1-based-including-header rows; in the 2T_WD part the row and column
#   indices are SWAPPED (toughtables.py:77-79); table categories come from
#   filename regexes (toughtables.py:15-26).
# --------------------------------------------------------------------------

#: reference `categories` dict (toughtables.py:15-26); ^-anchored for
#: re.match parity, ordered — first match wins
TOUGHTABLES_CATEGORIES = (
    ("CTRL_NOISE2", r"^CTRL_.+_NOISE2"),
    ("TOUGH_NOISE1", r"^TOUGH_.+_NOISE1"),
    ("TOUGH_NOISE2", r"^TOUGH_.+_NOISE2"),
    ("CTRL_WIKI", r"^CTRL_WIKI"),
    ("CTRL_DBP", r"^CTRL_DBP"),
    ("TOUGH_T2D", r"^TOUGH_T2D"),
    ("TOUGH_MISC", r"^TOUGH_.+_MISC"),
    ("TOUGH_MISSP", r"^TOUGH_.+_MISSP"),
    ("TOUGH_SORTED", r"^TOUGH_.+_SORTED"),
    ("TOUGH_HOMO", r"^TOUGH_.+_HOMO"),
)


def toughtables_category(name_col) -> F.Column:
    """Table name → category label (reference match_cat,
    toughtables.py:63-67); null when no pattern matches."""
    c = F.col(name_col) if isinstance(name_col, str) else name_col
    expr = F.lit(None).cast("string")
    for cat, pat in reversed(TOUGHTABLES_CATEGORIES):
        expr = F.when(c.rlike(pat), F.lit(cat)).otherwise(expr)
    return expr


def read_toughtables_cea(spark: SparkSession, path: str,
                         part: str = "2T") -> DataFrame:
    """ToughTables CEA gold → (doc_id, row, col, entity, category), one row
    per entity URI (cells carry space-separated URI lists, toughtables.py:82).
    Rows are rebased to 0-based body rows (``int(ri) - 1``); the 2T_WD part
    stores (row, col) swapped and is unswapped here (toughtables.py:77-80).
    """
    assert part in ("2T", "2T_WD"), part
    raw = spark.read.csv(path, schema="table string, a int, b int, ents string")
    ci = F.col("b") if part == "2T_WD" else F.col("a")
    ri = F.col("a") if part == "2T_WD" else F.col("b")
    return raw.select(
        F.col("table").alias("doc_id"),
        (ri - 1).cast("int").alias("row"),
        ci.alias("col"),
        F.explode(F.split(F.trim(F.coalesce("ents", F.lit(""))), r"\s+")).alias("entity"),
        toughtables_category("table").alias("category"),
    ).where(F.col("entity") != "")


def read_toughtables_cta(spark: SparkSession, path: str) -> DataFrame:
    """ToughTables CTA gold → (doc_id, col, class, category), one row per
    class URI (space-separated multi-class cells, same chunked-gt CSV shape,
    toughtables.py:68-70)."""
    raw = spark.read.csv(path, schema="table string, ci int, classes string")
    return raw.select(
        F.col("table").alias("doc_id"),
        F.col("ci").alias("col"),
        F.explode(
            F.split(F.trim(F.coalesce("classes", F.lit(""))), r"\s+")
        ).alias("class"),
        toughtables_category("table").alias("category"),
    ).where(F.col("class") != "")


# --------------------------------------------------------------------------
# LimayeGS (the Limaye200 entity-annotation gold standard)
# Reference: /root/reference/takco/evaluate/dataset/efthymiou.py:15-71 —
#   tables_instance/*.csv    headerless tables (mojibake-fixed: 3× latin1→
#                            utf8 round-trip + html unescape, fix/cls.fix)
#   entities_instance/*.csv  (uri, celltext, rownum); the annotated COLUMN is
#                            recovered by matching celltext within the row
# --------------------------------------------------------------------------

def limaye_fix_text(col) -> F.Column:
    """The reference's mojibake repair (efthymiou.py:26-30): a latin1→utf8
    re-decode round-trip, applied where it yields valid UTF-8. Spark's
    ``decode`` substitutes invalid sequences instead of dropping bytes
    (Python ``errors='ignore'``), so the round-trip is applied ONCE and only
    when the result contains no substitution character — the common
    double-encoded case the fix targets; pathological triple-encoding falls
    back to the raw string. Plus the html unescape for the named entities the
    gold files actually contain."""
    c = F.col(col) if isinstance(col, str) else col
    fixed = F.decode(F.encode(c, "ISO-8859-1"), "UTF-8")
    # apply only when (a) every source char is latin1-representable (encode
    # would otherwise lossily '?'-substitute, e.g. '€' or CJK) and (b) the
    # re-decode produced no substitution char (i.e. the bytes really were
    # double-encoded UTF-8)
    latin1_safe = ~c.rlike("[^\\x00-\\xff]")
    c = F.when(
        latin1_safe & fixed.isNotNull() & ~fixed.contains("�"), fixed
    ).otherwise(c)
    for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def read_limaye_tables(spark: SparkSession, tabledir: str) -> DataFrame:
    """LimayeGS ``tables_instance/*.csv`` → span documents (headerless —
    every span kind='cell'; efthymiou.py:55-59), cell text mojibake-fixed."""
    from takco_spark.sources.readers import read_csv_tables

    docs = read_csv_tables(spark, tabledir, header=False)
    spans = F.transform(
        F.col("spans"),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            limaye_fix_text(s["text"]).alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    return docs.select(
        _t2d_name(F.col("doc_id")).alias("doc_id"), spans.alias("spans")
    )


def read_limaye_cells(spark: SparkSession, tabledir: str) -> DataFrame:
    """LimayeGS tables as an exact CELL grid: (doc_id, row, col, text).

    Row/column indices come straight from the per-file CSV parse (same
    wholetext + mapInPandas shape as the S3 source — distributed, order
    exact), text mojibake-fixed like :func:`read_limaye_tables`. This is the
    join side for :func:`read_limaye_entity_gold`, where the reference needs
    positional lookup (efthymiou.py:44-49) that the flat span sequence only
    carries implicitly."""
    import csv as _csv
    import io

    import pandas as pd

    raw = spark.read.text(tabledir, wholetext=True).select(
        F.input_file_name().alias("doc_id"), "value"
    )

    def parse(batches):
        for pdf in batches:
            out = {"doc_id": [], "row": [], "col": [], "text": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["value"]):
                for ri, r in enumerate(_csv.reader(io.StringIO(content or ""))):
                    for ci, c in enumerate(r):
                        out["doc_id"].append(doc_id)
                        out["row"].append(ri)
                        out["col"].append(ci)
                        out["text"].append(c)
            yield pd.DataFrame(out)

    cells = raw.mapInPandas(
        parse, schema="doc_id string, row int, col int, text string"
    )
    return cells.select(
        _t2d_name(F.col("doc_id")).alias("doc_id"),
        "row", "col", limaye_fix_text("text").alias("text"),
    )


def read_limaye_entity_gold(spark: SparkSession, entitydir: str,
                            cells: DataFrame) -> DataFrame:
    """LimayeGS ``entities_instance/*.csv`` (uri, celltext, rownum) →
    (doc_id, row, col, entity, celltext).

    The gold file names a row and a CELL TEXT, not a column — the reference
    recovers the column by matching the text within that row
    (mapping_entities, efthymiou.py:32-51). Spark shape: equi-join the gold
    rows against the exact cell grid (:func:`read_limaye_cells`) on
    (doc_id, row, text) — distributed, no per-file Python loop. Both sides
    are mojibake-fixed + html-unescaped alike before matching (the
    reference applies cls.fix/html.unescape to both, efthymiou.py:40,59).
    URIs are percent-decoded (fix_uri = unquote_plus, efthymiou.py:34).
    Gold rows whose text matches no cell in the named row are dropped — the
    reference logs and skips these (efthymiou.py:45-48)."""
    gold = spark.read.csv(
        entitydir, schema="uri string, celltext string, rownum int"
    ).select(
        _t2d_name(F.input_file_name()).alias("doc_id"),
        F.url_decode(F.replace("uri", F.lit("+"), F.lit("%20"))).alias("entity"),
        limaye_fix_text("celltext").alias("celltext"),
        F.col("rownum").alias("row"),
    ).where(F.col("entity").isNotNull())
    return (
        gold.join(
            cells.select(
                "doc_id", "row", "col", F.col("text").alias("celltext")
            ),
            ["doc_id", "row", "celltext"],
        )
        .select("doc_id", "row", "col", "entity", "celltext")
        .distinct()
    )


def gold_mentions(documents: DataFrame) -> DataFrame:
    """Gold entity annotations from loaded TabEL documents:
    (doc_id, offset, surface, entity) — one row per linked cell. This is the
    label side the evaluation joins against (reference treats surfaceLink
    targets as gold, wdc.py:67-68 / evaluate/dataset usage)."""
    return (
        documents.select(
            "doc_id", F.explode("spans").alias("s")
        )
        .where((F.col("s.kind") == "mention") & (F.col("s.media_ref") != ""))
        .select(
            "doc_id",
            F.col("s.offset").alias("offset"),
            F.col("s.text").alias("surface"),
            F.col("s.media_ref").alias("entity"),
        )
    )
