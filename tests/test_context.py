"""add_context_rows — EP2 step 1 (reference tables_add_context_rows,
/root/reference/takco/cluster/context.py:8-63) in the span model."""

from pyspark.sql import functions as F

from takco_spark.functions.text import tokenize
from takco_spark.operators.triples import shift_annotation_cols
from takco_spark.spans import (
    add_context_rows,
    doc_segment_features,
    doc_text_features,
    span_sequence_mismatches,
    span_slice,
)

DOCS_SCHEMA = (
    "doc_id string, pgTitle string, section string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def _docs(spark):
    return spark.createDataFrame(
        [
            ("d1", "France Teams", "squads",
             [("header", "player", "", 0), ("cell", "zidane", "", 1)]),
            ("d2", "France Teams", None,
             [("cell", "henry", "", 0)]),
        ],
        DOCS_SCHEMA,
    )


def test_prepends_header_and_value_spans(spark):
    out = add_context_rows(_docs(spark), fields=("pgTitle",))
    row = out.where(F.col("doc_id") == "d1").select("spans").first()[0]
    assert [(s.kind, s.text, s.offset) for s in row] == [
        ("header", "_pgTitle", 0),
        ("cell", "France Teams", 1),
        ("header", "player", 2),
        ("cell", "zidane", 3),
    ]


def test_multiple_fields_first_listed_ends_first(spark):
    out = add_context_rows(_docs(spark), fields=("pgTitle", "section"))
    row = out.where(F.col("doc_id") == "d1").select("spans").first()[0]
    texts = [s.text for s in row]
    assert texts[:4] == ["_pgTitle", "France Teams", "_section", "squads"]
    # None field value → empty cell text (reference: table.get(field, ""))
    row2 = out.where(F.col("doc_id") == "d2").select("spans").first()[0]
    assert [s.text for s in row2][:4] == ["_pgTitle", "France Teams",
                                          "_section", ""]


def test_original_spans_preserved_after_slice(spark):
    docs = _docs(spark)
    out = add_context_rows(docs, fields=("pgTitle",))
    # slicing off the 2 context spans re-bases offsets → original sequence
    restored = out.select("doc_id", span_slice("spans", 2, 1 << 30).alias("spans"))
    assert span_sequence_mismatches(docs.select("doc_id", "spans"),
                                    restored) == 0


def test_context_marker_token_survives_tokenization(spark):
    """The `_pgTitle` marker stays ONE token through both tokenizers: the
    matcher tokenize() keeps `_`-prefixed text whole (case preserved), and
    the feature path's \\W+ split keeps it intact because `_` is a word
    char."""
    out = add_context_rows(_docs(spark), fields=("pgTitle",))
    toks = (
        out.select(F.explode("spans").alias("s"))
        .where(F.col("s.text") == "_pgTitle")
        .select(tokenize(F.col("s.text")).alias("t"))
        .first()["t"]
    )
    assert toks == ["_pgTitle"]
    feats = doc_text_features(out.select("doc_id", "spans"))
    tokens = feats.where(F.col("doc_id") == "d1").first()["tokens"]
    assert "_pgtitle" in tokens  # whole, lowercased, underscore intact
    # context VALUE tokens join the comparable token set (the EP2 point:
    # same-page docs now share blocking/scoring signal)
    assert "france" in tokens and "teams" in tokens


def test_context_becomes_leading_segment(spark):
    out = add_context_rows(_docs(spark), fields=("pgTitle",))
    segs = doc_segment_features(out.select("doc_id", "spans"))
    d1 = {r["seg"]: r["seg_tokens"] for r in
          segs.where(F.col("doc_id") == "d1").collect()}
    # segment 1 = the context column (header `_pgTitle` + its value);
    # segment 2 = the original player column
    assert sorted(d1) == [1, 2]
    assert "france" in d1[1] and "_pgtitle" in d1[1]
    assert "zidane" in d1[2]


def test_shift_annotation_cols(spark):
    ents = spark.createDataFrame(
        [("t", 0, 5, "E", 1.0, "pred")],
        "table_id string, col int, row int, entity string, score double, source string",
    )
    props = spark.createDataFrame(
        [("t", 0, 1, "p", 1.0, "pred")],
        "table_id string, from_col int, to_col int, prop string, score double, source string",
    )
    assert shift_annotation_cols(ents, 2, ("col",)).first()["col"] == 2
    shifted = shift_annotation_cols(props, 2, ("from_col", "to_col")).first()
    assert (shifted["from_col"], shifted["to_col"]) == (2, 3)
