"""flatten_triples — reference yield_triples semantics
(/root/reference/takco/evaluate/triples.py:14-133) over long-format
annotation streams, plus the novelty feed."""

import pytest
from pyspark.sql import functions as F

from takco_spark.operators.triples import (
    LABEL_P,
    TYPE_P,
    flatten_triples,
    triples_to_novelty_inputs,
)
from takco_spark.plans.metrics import novelty_counts


@pytest.fixture(scope="module")
def annotated(spark):
    # table tA: annotated (has gold); table tB: predictions only (no gold ⇒
    # gold flags must be NULL, not False)
    cells = spark.createDataFrame(
        [("tA", 0, 0, "berlin"), ("tA", 0, 1, "germany"),
         ("tA", 1, 0, "paris"), ("tA", 1, 1, "france"),
         ("tB", 0, 0, "x co"), ("tB", 0, 1, "2001")],
        "table_id string, row int, col int, text string",
    )
    entities = spark.createDataFrame(
        [("tA", 0, 0, "E_berlin", 0.9, "pred"),
         ("tA", 1, 0, "E_germany", 0.8, "pred"),
         ("tA", 0, 0, "E_berlin", 1.0, "gold"),
         ("tA", 0, 1, "E_paris", 1.0, "gold"),
         ("tB", 0, 0, "E_x", 0.7, "pred")],
        "table_id string, col int, row int, entity string, score double, source string",
    )
    classes = spark.createDataFrame(
        [("tA", 0, "City", 0.6, "pred"),
         ("tA", 0, "City", 1.0, "gold"),
         ("tB", 1, "Year", 0.5, "pred")],
        "table_id string, col int, cls string, score double, source string",
    )
    properties = spark.createDataFrame(
        [("tA", 0, 1, "capitalOf", 0.4, "pred"),
         ("tA", 0, 1, "capitalOf", 1.0, "gold"),
         ("tB", 0, 1, "founded", 0.3, "pred")],
        "table_id string, from_col int, to_col int, prop string, score double, source string",
    )
    return cells, entities, classes, properties


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_label_triples(spark, annotated):
    cells, entities, classes, properties = annotated
    out = flatten_triples(cells, entities, classes, properties)
    lab = _rows(out.where(F.col("kind") == "label")
                .select("table_id", "s", "p", "o", "gold", "pred"))
    assert lab == {
        ("tA", "E_berlin", LABEL_P, "berlin", True, True),
        ("tA", "E_germany", LABEL_P, "germany", False, True),  # col1 row0
        ("tA", "E_paris", LABEL_P, "paris", True, False),      # col0 row1
        ("tB", "E_x", LABEL_P, "x co", None, True),  # no gold ⇒ NULL
    }


def test_class_triples(spark, annotated):
    cells, entities, classes, properties = annotated
    out = flatten_triples(cells, entities, classes, properties)
    clt = _rows(out.where(F.col("kind") == "class")
                .select("table_id", "s", "p", "o", "gold", "pred"))
    # col-0 entities × col-0 classes; E_germany sits in col 1 → no class
    # triple; E_paris is a GOLD-ONLY cell — the reference iterates PRED
    # entity rows only (triples.py:51), so it emits nothing (r4 advice:
    # restrict class/property emission to pred-present keys)
    assert clt == {
        ("tA", "E_berlin", TYPE_P, "City", True, True),
    }


def test_property_triples_entity_and_literal_branches(spark, annotated):
    cells, entities, classes, properties = annotated
    out = flatten_triples(cells, entities, classes, properties)
    prp = _rows(out.where(F.col("kind") == "property")
                .select("table_id", "s", "p", "o", "o_datatype",
                        "gold", "pred"))
    # tA col 1 has a predicted entity (E_germany, row 0) → entity-object
    # branch: row 0 emits (E_berlin → E_germany); row 1 (E_paris) has no
    # predicted to-entity → nothing. tB col 1 has no entities → literal
    # branch with the predicted class 'Year' as datatype.
    assert prp == {
        ("tA", "E_berlin", "capitalOf", "E_germany", None, True, True),
        ("tB", "E_x", "founded", "2001", "Year", None, True),
    }


def test_entity_object_branch(spark):
    """A predicted to-column entity becomes the triple object; rows without
    a predicted to-entity emit nothing (reference triples.py:101-108)."""
    cells = spark.createDataFrame(
        [("t", 0, 0, "berlin"), ("t", 0, 1, "germany"),
         ("t", 1, 0, "paris"), ("t", 1, 1, "france")],
        "table_id string, row int, col int, text string",
    )
    entities = spark.createDataFrame(
        [("t", 0, 0, "E_berlin", 0.9, "pred"),     # col 0, row 0
         ("t", 1, 0, "E_germany", 0.9, "pred"),    # col 1, row 0
         ("t", 0, 0, "E_berlin", 1.0, "gold"),
         ("t", 1, 0, "E_germany", 1.0, "gold"),
         ("t", 0, 1, "E_paris", 0.9, "pred")],     # col 0, row 1
        "table_id string, col int, row int, entity string, score double, source string",
    )
    properties = spark.createDataFrame(
        [("t", 0, 1, "capitalOf", 0.4, "pred"),
         ("t", 0, 1, "capitalOf", 1.0, "gold")],
        "table_id string, from_col int, to_col int, prop string, score double, source string",
    )
    out = flatten_triples(cells, entities, classes=None,
                          properties=properties)
    prp = _rows(out.where(F.col("kind") == "property")
                .select("s", "p", "o", "gold", "pred"))
    # row 0: pred to-entity exists → object E_germany, gold (both s and p
    # gold) and pred. row 1: E_paris has no pred to-entity → nothing.
    assert prp == {("E_berlin", "capitalOf", "E_germany", True, True)}


def test_novelty_feed(spark, annotated):
    cells, entities, classes, properties = annotated
    out = flatten_triples(cells, entities, classes, properties)
    kinds, gold, pred = triples_to_novelty_inputs(out)
    counts = {r["kind"]: (r["tp"], r["fp"], r["fn"])
              for r in novelty_counts(kinds, gold, pred).collect()}
    # label: E_berlin tp; E_germany + E_x fp (tB's NULL gold ≠ gold);
    # E_paris fn. class: E_berlin tp only — E_paris is a gold-only cell and
    # the reference emits class triples for PRED entity rows only
    # (triples.py:51), so its gold class triple never enters the gold set.
    # property: capitalOf tp, founded fp (NULL gold counts as not-gold).
    assert counts == {
        "label": (1, 2, 1),
        "class": (1, 0, 0),
        "property": (1, 1, 0),
    }
