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
