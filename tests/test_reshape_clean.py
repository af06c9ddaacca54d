"""P3/P7 grid cleanup operators + the extended F18 finder table
(reference /root/reference/takco/reshape/clean.py:38-40,82-96,171-186 and
resources/pipelines/wikitables.toml:41-77)."""

from pyspark.sql import functions as F

from takco_spark.operators.reshape import (
    document_grid,
    find_pivot_cells,
    grid_to_documents,
    max_width_guard,
    remove_empty_columns,
    remove_empty_rows,
)
from takco_spark.spans import DOCUMENT_SCHEMA


def _doc(doc_id, kinds_texts):
    return {"doc_id": doc_id, "spans": [
        {"kind": k, "text": t, "media_ref": "", "offset": i}
        for i, (k, t) in enumerate(kinds_texts)]}


def _grid_doc(doc_id, header, rows):
    kt = [("header", h) for h in header]
    for r in rows:
        kt += [("cell", c) for c in r]
    return _doc(doc_id, kt)


def test_max_width_guard(spark):
    """P3: documents >= max_cols wide are discarded (clean.py:38-40)."""
    docs = spark.createDataFrame([
        _grid_doc("narrow", ["a", "b"], [["1", "2"]]),
        _grid_doc("wide", [f"h{i}" for i in range(5)],
                  [[str(i) for i in range(5)]]),
    ], schema=DOCUMENT_SCHEMA)
    kept = {r["doc_id"] for r in max_width_guard(docs, max_cols=5).collect()}
    assert kept == {"narrow"}
    # explicit width overrides the header-count inference
    kept2 = {r["doc_id"] for r in
             max_width_guard(docs, max_cols=5, n_cols=F.lit(3)).collect()}
    assert kept2 == {"narrow", "wide"}


def test_document_grid_round_trip(spark):
    """document_grid assigns row-major (row, col); grid_to_documents is its
    inverse on dense grids (offsets re-based)."""
    docs = spark.createDataFrame(
        [_grid_doc("d", ["name", "pop"], [["Ams", "872"], ["Utr", "361"]])],
        schema=DOCUMENT_SCHEMA,
    )
    g = document_grid(docs)
    cells = {(r["row"], r["col"]): (r["kind"], r["text"]) for r in g.collect()}
    assert cells[(0, 0)] == ("header", "name")
    assert cells[(1, 1)] == ("cell", "872")
    assert cells[(2, 0)] == ("cell", "Utr")
    back = grid_to_documents(g).collect()[0]
    orig = docs.collect()[0]
    assert [tuple(s) for s in back["spans"]] == [tuple(s) for s in orig["spans"]]


def test_remove_empty_rows(spark):
    """P7a: all-empty rows dropped, remaining rows renumbered densely
    (clean.py:171-186)."""
    docs = spark.createDataFrame(
        [_grid_doc("d", ["a", "b"], [["", "  "], ["x", ""], ["", ""], ["", "y"]])],
        schema=DOCUMENT_SCHEMA,
    )
    out = remove_empty_rows(document_grid(docs))
    rows = sorted({r["row"] for r in out.collect()})
    assert rows == [0, 1, 2]  # header + 2 surviving body rows
    texts = {(r["row"], r["col"]): r["text"] for r in out.collect()}
    assert texts[(1, 0)] == "x" and texts[(2, 1)] == "y"


def test_remove_empty_columns(spark):
    """P7b: a column with header text but no body text is dropped; columns
    renumber densely (clean.py:82-96 checks tableData only)."""
    docs = spark.createDataFrame(
        [_grid_doc("d", ["a", "ghost", "c"],
                   [["1", "", "3"], ["4", " ", "6"]])],
        schema=DOCUMENT_SCHEMA,
    )
    out = remove_empty_columns(document_grid(docs))
    cols = sorted({r["col"] for r in out.collect()})
    assert cols == [0, 1]
    headers = {r["col"]: r["text"] for r in out.collect() if r["kind"] == "header"}
    assert headers == {0: "a", 1: "c"}


def test_pivot_finders_extended(spark):
    """F18: the wikitables.toml RegexFinder family (year/time/acronym/round);
    patterns are ^-anchored (re.match parity)."""
    heads = spark.createDataFrame(
        [("d", 0, "2004-05 season"), ("d", 1, "champion 1999"),
         ("d", 2, "kickoff 7:30PM"), ("d", 3, "OT"), ("d", 4, "Total"),
         ("d", 5, "NASA"), ("d", 6, "plain header")],
        "doc_id string, ci int, text string",
    )

    def got(finder):
        return {r["ci"]: (r["pivot_var"], r["pivot_val"])
                for r in find_pivot_cells(heads, finder).collect()}

    yp = got("year_prefix")
    assert yp[0] == ("season", "2004-05")
    assert 6 not in yp
    ys = got("year_suffix")
    assert ys[1] == ("champion", "1999")
    tm = got("time")
    assert tm[2] == ("kickoff", "7:30PM")
    sr = got("sports_round")
    # no var group → reference split yields (cell, cell)
    assert sr[3] == ("OT", "OT") and sr[4] == ("Total", "Total")
    assert 2 not in sr  # anchored: 'kickoff 7:30PM' must NOT match ^(\d+|OT..)$
    ac = got("short_uppercase_acronym")
    assert ac[5] == ("NASA", "NASA")
    assert 6 not in ac


def test_seq_prefix_pivots(spark):
    """F18 SeqPrefix (findpivot.py:349-391): shared first-token prefix marks
    and splits the cells carrying it."""
    from takco_spark.operators.reshape import seq_prefix_pivots

    heads = spark.createDataFrame(
        [("d", 0, 0, "round 1"), ("d", 0, 1, "round 2"), ("d", 0, 2, "name"),
         ("e", 0, 0, "alpha"), ("e", 0, 1, "beta")],
        "doc_id string, row int, col int, text string",
    )
    out = {(r["doc_id"], r["col"]): (r["pivot_var"], r["pivot_val"])
           for r in seq_prefix_pivots(heads).collect()}
    assert out == {("d", 0): ("round", "1"), ("d", 1): ("round", "2")}


def test_spanned_repeat_pivots(spark):
    """F18 SpannedRepeat (findpivot.py:394-448): a colspan-run cell over a
    column range where another header row repeats a value."""
    from takco_spark.operators.reshape import spanned_repeat_pivots

    # row 0: 'score' spans cols 1-2 (dense-grid replication);
    # row 1: 'home'/'away' under it, and 'pts' repeats in 2 separate runs
    heads = spark.createDataFrame(
        [("d", 0, 0, "team"), ("d", 0, 1, "score"), ("d", 0, 2, "score"),
         ("d", 1, 0, "name"), ("d", 1, 1, "pts"), ("d", 1, 2, "pts2"),
         ("d", 2, 0, "x"), ("d", 2, 1, "pts"), ("d", 2, 2, "pts")],
        "doc_id string, row int, col int, text string",
    )
    # 'pts' appears in rows 1 and 2 but within row 1 it's a single run and
    # row 2 it's ONE adjacent run (colspan), so no repeat -> only trigger is
    # a genuinely repeating value in another row inside the span:
    out = {(r["row"], r["col"]) for r in spanned_repeat_pivots(heads).collect()}
    assert out == set()  # no non-adjacent repeats anywhere

    heads2 = spark.createDataFrame(
        [("d", 0, 0, "2004"), ("d", 0, 1, "2004"), ("d", 0, 2, "2005"),
         ("d", 0, 3, "2005"),
         ("d", 1, 0, "pts"), ("d", 1, 1, "rank"), ("d", 1, 2, "pts"),
         ("d", 1, 3, "rank")],
        "doc_id string, row int, col int, text string",
    )
    out2 = {(r["row"], r["col"], r["text"])
            for r in spanned_repeat_pivots(heads2).collect()}
    # the year cells span 2 cols each, and 'pts'/'rank' repeat as separate
    # runs in row 1 inside each span -> all four year cells are pivots
    assert out2 == {(0, 0, "2004"), (0, 1, "2004"), (0, 2, "2005"),
                    (0, 3, "2005")}


def _headers_df(spark, rows):
    """rows: (doc_id, row, col, text)"""
    return spark.createDataFrame(rows, "doc_id string, row int, col int, text string")


def test_attribute_context_pivots(spark):
    from takco_spark.operators.reshape import attribute_context_pivots

    headers = _headers_df(spark, [
        ("d1", 0, 0, "Country"), ("d1", 0, 1, "Albums"),
        ("d2", 0, 0, "Albums"), ("d2", 0, 1, "Year"),
        ("d3", 0, 0, "Year"), ("d3", 0, 1, "Sales"),
    ])
    # d1's page attribute equals its own header cell "Albums" -> build
    # collects "Albums"; find then flags the cell in d2 as well.
    attrs = spark.createDataFrame(
        [("d1", "albums"), ("d2", "unrelated"), ("d3", "x")],
        "doc_id string, att string")
    got = {(r.doc_id, r.row, r.col)
           for r in attribute_context_pivots(headers, attrs).collect()}
    assert got == {("d1", 0, 1), ("d2", 0, 0)}


def test_rule_pivots(spark):
    from takco_spark.operators.reshape import rule_pivots

    headers = _headers_df(spark, [
        ("d1", 0, 0, "Team"), ("d1", 0, 1, "W"), ("d1", 0, 2, "L"),
        ("d2", 0, 0, "Team"), ("d2", 0, 1, "Points"),
        ("d3", 0, 0, "W"), ("d3", 0, 1, "L"),
    ])
    # value_vars given: only rows containing Team AND W AND L yield W/L cells
    got = {(r.doc_id, r.col)
           for r in rule_pivots(headers, ["Team"], ["W", "L"]).collect()}
    assert got == {("d1", 1), ("d1", 2)}
    # no value_vars: every non-id cell of qualifying rows
    got2 = {(r.doc_id, r.col)
            for r in rule_pivots(headers, ["Team"], []).collect()}
    assert got2 == {("d1", 1), ("d1", 2), ("d2", 1)}
    assert rule_pivots(headers, [], []).count() == 0


def test_agent_like_pivots(spark):
    from takco_spark.operators.reshape import agent_like_pivots

    links = spark.createDataFrame([
        ("d1", 0, 0, "e:person1"),   # agent-like
        ("d1", 0, 1, "e:listpage"),  # has id_type
        ("d1", 0, 2, "e:klass"),     # used as class
        ("d1", 0, 3, "e:unitish"),   # has id_prop
        ("d1", 0, 4, "e:person1"),   # two links, one attr-like -> not all agent
        ("d1", 0, 4, "e:klass"),
    ], "doc_id string, row int, col int, entity string")
    kb_classes = spark.createDataFrame([
        ("e:person1", "e:Human"),
        ("e:listpage", "e:ListPage"),
        ("e:x", "e:klass"),
    ], "entity string, cls string")
    facts = spark.createDataFrame(
        [("e:unitish", "p:hasUnit")], "s string, p string")
    got = {(r.doc_id, r.row, r.col) for r in agent_like_pivots(
        links, kb_classes, facts,
        id_types=["e:ListPage"], id_props=["p:hasUnit"]).collect()}
    assert got == {("d1", 0, 0)}


def test_template_compound_split(spark):
    from takco_spark.operators.reshape import (
        _learn_template, _parse_template, template_compound_split,
    )

    # pure-python learner sanity
    blocks = _learn_template(
        ["12 kg (provisional)", "7 kg (final)", "103 kg (est)"], 2)
    # ")" is shorter than min_block_size, so it is not a static block
    assert blocks == [" kg ("]
    assert _parse_template(blocks, "12 kg (provisional)") == [
        "12", "provisional)"]

    cells = spark.createDataFrame([
        ("c0", 0, "12 kg (provisional)"),
        ("c0", 1, "7 kg (final)"),
        ("c0", 2, "103 kg (est)"),
        ("c1", 0, "alpha"),          # no common template -> no output
        ("c1", 1, "Zq"),
    ], "col string, row int, text string")
    out = template_compound_split(cells, min_block_size=2)
    rows = {(r.grp, r.id, r.part, r.value) for r in out.collect()}
    # gap 0 (before " kg (") has empty preceding block -> named "0";
    # gap 1 (between blocks) -> part " kg (".strip() == "kg ("
    assert ("c0", 0, "0", "12") in rows
    assert ("c0", 1, "0", "7") in rows
    assert ("c0", 2, "0", "103") in rows
    assert ("c0", 0, "kg (", "provisional)") in rows
    assert ("c0", 1, "kg (", "final)") in rows
    assert not any(g == "c1" for (g, _, _, _) in rows)
    # trailing all-empty gap dropped by col_is_ok
    assert not any(v == "" for (_, _, _, v) in rows)

    # min_cell_size gate drops the short-value column
    gated = template_compound_split(cells, min_block_size=2, min_cell_size=3)
    gvals = {(r.part, r.value) for r in gated.collect()}
    assert all(p != "0" for p, _ in gvals)  # "12"/"7" column gated out
