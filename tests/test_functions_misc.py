"""Scalar-layer parity: tolerance matchers, span algebra, header_id, masks,
and the no-row-UDF invariant."""

import hashlib
import subprocess

import pytest
from pyspark.sql import functions as F

from takco_spark.functions import text, tolerance
from takco_spark.spans import span_concat, span_slice


def test_header_id_matches_reference_arithmetic(spark):
    """headerId = int(sha224(x).hexdigest()[:16], 16) // 2 — the exact
    reference formula (takco/table.py:218-225)."""
    vals = ["City~Pop 2010", "name", "", "ünïcode header"]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", text.header_id("s").alias("h")).collect()}
    for v in vals:
        expected = int(hashlib.sha224(v.encode("utf-8")).hexdigest()[:16], 16) // 2
        assert got[v] == expected, v


def test_tolerance_sims(spark):
    df = spark.createDataFrame([("2001-01-01", "2001-07-02", 100.0, 95.0)],
                               ["d1", "d2", "x", "y"])
    row = df.select(
        tolerance.datetime_tolerance_sim(
            tolerance.parse_datetime("d1"), tolerance.parse_datetime("d2")
        ).alias("dt"),
        tolerance.numeric_tolerance_sim(F.col("x"), F.col("y")).alias("num"),
    ).collect()[0]
    assert row["dt"] == pytest.approx(0.5, abs=0.01)  # ~half a year apart
    assert row["num"] == pytest.approx(1 - 5 / 100)


def test_numeric_tolerance_zero_edge(spark):
    df = spark.createDataFrame([(0.0, 0.0)], ["x", "y"])
    assert df.select(
        tolerance.numeric_tolerance_sim(F.col("x"), F.col("y")).alias("s")
    ).collect()[0]["s"] == 1.0


def test_digit_mask_and_year(spark):
    df = spark.createDataFrame(
        [("pop 1999", "1999"), ("$12.50", "2001-04"), ("abc", "noyear")],
        ["a", "b"],
    )
    rows = df.select(
        text.digit_mask("a").alias("m"), text.year_extract("b").alias("y")
    ).collect()
    assert rows[0]["m"] == "pop $$$$"
    assert rows[0]["y"] == "1999"
    assert rows[1]["m"] == "$MONEY$"
    assert rows[1]["y"] == "2001"
    assert rows[2]["y"] == ""


def test_unpivot(spark):
    df = spark.createDataFrame(
        [("r1", 10, 20), ("r2", 30, 40)], ["k", "y2010", "y2020"]
    )
    out = tolerance.unpivot(df, ["k"], ["y2010", "y2020"], "year", "pop")
    assert out.count() == 4
    got = {(r["k"], r["year"]): r["pop"] for r in out.collect()}
    assert got[("r1", "y2010")] == 10 and got[("r2", "y2020")] == 40


def test_common_prefix(spark):
    df = spark.createDataFrame(
        [("pop_2010", "pop_2020"), ("abc", "xyz"), ("same", "same")], ["a", "b"]
    )
    got = [r["p"] for r in
           df.select(tolerance.common_prefix("a", "b").alias("p")).collect()]
    assert got == [len("pop_20"), 0, 4]


def test_span_slice_and_concat(spark):
    spans = [
        {"kind": "header", "text": "h", "media_ref": "", "offset": 0},
        {"kind": "cell", "text": "a", "media_ref": "", "offset": 1},
        {"kind": "media", "text": "", "media_ref": "m1", "offset": 2},
        {"kind": "cell", "text": "b", "media_ref": "", "offset": 3},
    ]
    df = spark.createDataFrame(
        [("d1", spans)],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    sliced = df.select(span_slice("spans", 1, 3).alias("s")).collect()[0]["s"]
    assert [(x["text"], x["media_ref"], x["offset"]) for x in sliced] == [
        ("a", "", 0), ("", "m1", 1)
    ]
    both = df.select(span_concat("spans", "spans").alias("s")).collect()[0]["s"]
    assert [x["offset"] for x in both] == list(range(8))
    assert both[4]["kind"] == "header" and both[6]["media_ref"] == "m1"


def test_no_row_udfs_in_package():
    """Invariant (input_hint: no per-row Python): the package never uses
    row-at-a-time F.udf / @udf — only Arrow-batched pandas UDFs."""
    out = subprocess.run(
        ["grep", "-rnE", r"F\.udf|^from pyspark.sql.functions import udf|@udf\(",
         "takco_spark/"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.stdout.strip() == "", f"row UDFs found:\n{out.stdout}"


def test_compound_split_suffix(spark):
    """F17: group-wise common suffix detected via the min/max trick and
    stripped anchored (reference SuffixCompoundSplitter,
    reshape/compound.py:97-111)."""
    from takco_spark.operators.reshape import compound_affixes, compound_split

    cells = spark.createDataFrame(
        [("a", "12 kg"), ("a", "7 kg"), ("a", "913 kg"),
         ("b", "red"), ("b", "blue")],
        "col string, text string",
    )
    aff = {r["grp"]: r["affix"] for r in
           compound_affixes(cells, mode="suffix").collect()}
    assert aff == {"a": " kg"}  # group b has no common suffix
    out = {(r["col"], r["text"]): (r["affix"], r["stripped"])
           for r in compound_split(cells, mode="suffix").collect()}
    assert out[("a", "12 kg")] == (" kg", "12")
    assert out[("a", "913 kg")] == (" kg", "913")
    assert out[("b", "red")] == ("", "red")  # untouched pass-through


def test_compound_split_prefix(spark):
    from takco_spark.operators.reshape import compound_split

    cells = spark.createDataFrame(
        [("a", "Brand#12"), ("a", "Brand#34"), ("a", "Brand#3")],
        "col string, text string",
    )
    rows = compound_split(cells, mode="prefix").collect()
    assert {r["stripped"] for r in rows} == {"12", "34", "3"}
    assert all(r["affix"] == "Brand#" for r in rows)


def test_find_pivot_cells_num_suffix_prefix(spark):
    """F18: regex pivot finders split 'var val' header cells (reference
    NumSuffix/NumPrefix, findpivot.py:332-347)."""
    from takco_spark.operators.reshape import find_pivot_cells

    heads = spark.createDataFrame(
        [("d1", 0, "sales 2004"), ("d1", 1, "sales 2005"),
         ("d1", 2, "region"), ("d2", 0, "2004 sales")],
        "doc_id string, ci int, text string",
    )
    suf = {(r["doc_id"], r["ci"]): (r["pivot_var"], r["pivot_val"])
           for r in find_pivot_cells(heads, "num_suffix").collect()}
    assert suf == {("d1", 0): ("sales", "2004"), ("d1", 1): ("sales", "2005")}
    pre = {(r["doc_id"], r["ci"]): (r["pivot_var"], r["pivot_val"])
           for r in find_pivot_cells(heads, "num_prefix").collect()}
    assert pre[("d2", 0)] == ("sales", "2004")


def test_heuristic_transpose_1x2(spark):
    """F20: only 1-data-row × 2-col docs transpose; others untouched."""
    from takco_spark.operators.reshape import heuristic_transpose

    from takco_spark.spans import DOCUMENT_SCHEMA

    def doc(doc_id, kinds_texts):
        return {"doc_id": doc_id, "spans": [
            {"kind": k, "text": t, "media_ref": "", "offset": i}
            for i, (k, t) in enumerate(kinds_texts)]}

    docs = spark.createDataFrame([
        doc("t", [("header", "name"), ("header", "pop"),
                  ("cell", "Ams"), ("cell", "872")]),
        doc("u", [("header", "a"), ("cell", "1"), ("cell", "2"),
                  ("cell", "3")]),
    ], schema=DOCUMENT_SCHEMA)
    out = {r["doc_id"]: [(s["kind"], s["text"], s["offset"]) for s in r["spans"]]
           for r in heuristic_transpose(docs).collect()}
    assert out["t"] == [("cell", "name", 0), ("cell", "Ams", 1),
                        ("cell", "pop", 2), ("cell", "872", 3)]
    assert [t for _, t, _ in out["u"]] == ["a", "1", "2", "3"]  # untouched
    assert out["u"][0][0] == "header"
