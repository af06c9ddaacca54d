"""Sources & sinks: robust JSONL, CSV-per-file docs, globs, parquet store."""

import json
import os

from takco_spark.sources import readers


def test_jsonl_roundtrip_and_corrupt_lines(spark, tmp_path):
    good = [
        {"doc_id": "a", "spans": [
            {"kind": "cell", "text": "x", "media_ref": "", "offset": 0}]},
        {"doc_id": "b", "spans": [
            {"kind": "header", "text": "y", "media_ref": "", "offset": 0},
            {"kind": "media", "text": "", "media_ref": "m1", "offset": 1}]},
    ]
    p = tmp_path / "in.jsonl"
    with open(p, "w") as f:
        for row in good:
            f.write(json.dumps(row) + "\n")
        f.write("{ this is not json }\n")          # corrupt line
        f.write('"just a string"\n')               # wrong shape

    df = readers.read_documents_jsonl(spark, str(p))
    rows = {r["doc_id"]: r["spans"] for r in df.collect()}
    assert set(rows) == {"a", "b"}
    assert rows["b"][1]["media_ref"] == "m1"

    # Spark disallows querying ONLY the corrupt column from raw JSON — cache
    # the parsed result first (documented Spark behavior)
    with_corrupt = readers.read_documents_jsonl(spark, str(p), keep_corrupt=True).cache()
    with_corrupt.count()  # materialize the cache so the corrupt column is queryable
    assert with_corrupt.where("_corrupt is not null").count() >= 1
    with_corrupt.unpersist()

    # sink → load back (glob path, S4)
    outdir = tmp_path / "out"
    readers.write_documents_jsonl(df, str(outdir))
    back = readers.read_documents_jsonl(spark, str(outdir) + "/*.json")
    assert back.count() == 2


def test_csv_file_becomes_one_document(spark, tmp_path):
    d = tmp_path / "csvs"
    os.makedirs(d)
    (d / "t1.csv").write_text("name,pop\nAmsterdam,872680\nUtrecht,361924\n")
    (d / "t2.csv").write_text("name,pop\nBerlin,3769495\n")
    docs = readers.read_csv_tables(spark, str(d))
    rows = docs.collect()
    assert len(rows) == 2  # one document per file
    by_file = {os.path.basename(r["doc_id"]): r["spans"] for r in rows}
    t1 = by_file["t1.csv"]
    assert [s["offset"] for s in t1] == list(range(len(t1)))
    # span text order == file cell order, row-major (reference TableSet.csvs)
    assert [s["text"] for s in t1] == [
        "name", "pop", "Amsterdam", "872680", "Utrecht", "361924"]
    # row 0 is the header row
    assert [s["kind"] for s in t1] == ["header"] * 2 + ["cell"] * 4


def test_csv_quoted_newlines_and_order(spark, tmp_path):
    d = tmp_path / "csvq"
    os.makedirs(d)
    (d / "q.csv").write_text('a,b\n"line1\nline2",x\nlast,y\n')
    rows = readers.read_csv_tables(spark, str(d)).collect()
    assert len(rows) == 1
    spans = rows[0]["spans"]
    assert [s["text"] for s in spans] == ["a", "b", "line1\nline2", "x", "last", "y"]
    assert [s["kind"] for s in spans] == ["header", "header", "cell", "cell", "cell", "cell"]
    assert [s["offset"] for s in spans] == list(range(6))


def test_parquet_artifact_store(spark, tmp_path):
    df = spark.range(100).selectExpr("id", "id % 7 as bucket")
    readers.write_table(df, str(tmp_path / "t"), partition_by=["bucket"])
    back = spark.read.parquet(str(tmp_path / "t"))
    assert back.count() == 100
    # partition pruning works on the layout
    assert back.where("bucket = 3").count() == df.where("id % 7 = 3").count()


def test_html_tables_grid_expansion_pure():
    """S9 parser semantics without Spark: colspan/rowspan expand into a dense
    replicated grid (reference Extractor.parse, htmltables.py:50-140)."""
    from takco_spark.sources.html_tables import tables_from_html

    html = """
    <html><body><p>noise</p>
    <table>
      <tr><th>h1</th><th colspan="2">h23</th></tr>
      <tr><td rowspan="2">a</td><td>b</td><td><a href="/x">X</a></td></tr>
      <tr><td>c</td><td>d</td></tr>
    </table>
    <table><tr><td>only</td></tr></table>
    </body></html>"""
    grids = tables_from_html(html)
    assert len(grids) == 2
    g = grids[0]
    texts = [[" ".join(c.text).strip() if c else None for c in row] for row in g]
    assert texts == [["h1", "h23", "h23"], ["a", "b", "X"], ["a", "c", "d"]]
    assert g[0][0].header and g[0][1].header and not g[1][0].header
    assert g[1][2].href == "/x"


def test_read_html_tables_documents(spark, tmp_path):
    d = tmp_path / "pages"
    os.makedirs(d)
    (d / "p1.html").write_text(
        "<table><tr><th>name</th><th>pop</th></tr>"
        "<tr><td><a href='/Q1'>Amsterdam</a></td><td>872680</td></tr></table>"
        "<table><tr><td>second</td></tr></table>"
    )
    from takco_spark.sources.html_tables import read_html_tables

    rows = read_html_tables(spark, str(d)).collect()
    assert len(rows) == 2  # one document per table
    by_id = {r["doc_id"].split("#")[-1]: r["spans"] for r in rows}
    t0 = by_id["t0"]
    assert [s["text"] for s in t0] == ["name", "pop", "Amsterdam", "872680"]
    assert [s["kind"] for s in t0] == ["header", "header", "mention", "cell"]
    assert t0[2]["media_ref"] == "/Q1"
    assert [s["offset"] for s in t0] == [0, 1, 2, 3]
    assert [s["text"] for s in by_id["t1"]] == ["second"]


def _make_warc(records):
    """Build a minimal WARC/1.0 byte stream of response records."""
    out = b""
    for url, html in records:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html.encode()
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode() + b"\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n"
        )
        out += head + b"\r\n" + http + b"\r\n\r\n"
    return out


def test_warc_pages_and_table_composition(spark, tmp_path):
    """S8 WarcPages → S9 tables: response records parsed (incl. ?about=
    split, gzip member), HTTP headers stripped, tables become documents."""
    import gzip

    d = tmp_path / "warcs"
    os.makedirs(d)
    html1 = "<table><tr><th>h</th></tr><tr><td>v</td></tr></table>"
    raw = _make_warc([
        ("http://ex.org/a?about=http://kb/E1", html1),
        ("http://ex.org/b", "<p>no tables here</p>"),
    ])
    (d / "x.warc").write_bytes(raw)
    (d / "y.warc.gz").write_bytes(gzip.compress(_make_warc([
        ("http://ex.org/c", "<table><tr><td>z</td></tr></table>"),
    ])))

    from takco_spark.sources.html_tables import html_pages_to_documents
    from takco_spark.sources.pages import read_warc_pages

    pages = read_warc_pages(spark, str(d))
    rows = {r["url"]: r for r in pages.collect()}
    assert set(rows) == {"http://ex.org/a", "http://ex.org/b", "http://ex.org/c"}
    assert rows["http://ex.org/a"]["about"] == "http://kb/E1"
    assert rows["http://ex.org/a"]["html"] == html1  # HTTP headers stripped

    docs = html_pages_to_documents(pages).collect()
    by_id = {r["doc_id"]: [s["text"] for s in r["spans"]] for r in docs}
    assert by_id == {"http://ex.org/a#t0": ["h", "v"], "http://ex.org/c#t0": ["z"]}


def test_line_pages(spark, tmp_path):
    import json

    d = tmp_path / "lines"
    os.makedirs(d)
    (d / "p.txt").write_text(
        "http://w/Amsterdam " + json.dumps("<table><tr><td>x</td></tr></table>") + "\n"
        "http://w/Utrecht " + json.dumps("<b>no table</b>") + "\n"
    )
    from takco_spark.sources.pages import read_line_pages

    pages = read_line_pages(spark, str(d), title_regex=r"^http://w/(.+)$")
    rows = {r["url"]: r for r in pages.collect()}
    assert rows["http://w/Amsterdam"]["about"] == "Amsterdam"
    assert rows["http://w/Amsterdam"]["html"].startswith("<table>")


def test_html_implied_closures_pure():
    """HTML5 allows omitting </tr>/</td>; the parser must flush open
    rows/cells on implied closure and on </table> (real pages do this)."""
    from takco_spark.sources.html_tables import tables_from_html

    tabs = tables_from_html("<table><tr><td>a<td>b<tr><td>c</table>")
    assert len(tabs) == 1
    texts = [[("".join(c.text) if c else None) for c in row] for row in tabs[0]]
    assert texts == [["a", "b"], ["c", None]]
    # open row at </table> with explicit cells is also flushed
    tabs2 = tables_from_html("<table><tr><th>h</th><td>v</table>")
    assert [["".join(c.text) for c in tabs2[0][0]]] == [["h", "v"]]


def test_tabel_gold_loader(spark):
    """S10: TabEL/WDC JSON table dump → span documents with row-major span
    order and surfaceLink targets as mention media_refs; gold_mentions
    recovers the annotation side (reference wdc.py:27-73)."""
    from takco_spark.sources.gold import gold_mentions, read_tabel

    docs = read_tabel(spark, "tests/data/tabel_sample.jsonl")
    by_id = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                           for s in r["spans"]] for r in docs.collect()}
    assert set(by_id) == {"sample-0001", "Rivers#t3"}
    # row-major, offsets 0..n-1, header row first
    assert by_id["sample-0001"] == [
        ("header", "City", "", 0), ("header", "Country", "", 1),
        ("mention", "Amsterdam", "Amsterdam", 2),
        ("mention", "Netherlands", "Netherlands", 3),
        ("mention", "Utrecht", "Utrecht", 4),
        ("cell", "Netherlands", "", 5),
    ]
    assert by_id["Rivers#t3"] == [("header", "River", "", 0),
                                  ("cell", "Rhine", "", 1)]
    gold = {(r["doc_id"], r["offset"]): r["entity"]
            for r in gold_mentions(docs).collect()}
    assert gold[("sample-0001", 2)] == "Amsterdam"
    assert ("sample-0001", 5) not in gold


def test_t2d_gold_loader(spark):
    """S10: T2D v2 layout — column-major table JSON transposed to row-major
    spans; instance/property/class gold CSVs parsed with URI normalization
    (reference t2d.py:12-215)."""
    from takco_spark.sources.gold import (
        read_t2d_classes,
        read_t2d_entity_gold,
        read_t2d_property_gold,
        read_t2d_tables,
    )

    base = "tests/data/t2d_sample"
    docs = {r["doc_id"]: [(s["kind"], s["text"]) for s in r["spans"]]
            for r in read_t2d_tables(spark, f"{base}/tables").collect()}
    assert docs["cities"] == [
        ("header", "city"), ("header", "country"),
        ("cell", "Amsterdam"), ("cell", "Netherlands"),
        ("cell", "Utrecht"), ("cell", "Netherlands"),
    ]
    assert docs["rivers"] == [("header", "river"), ("cell", "Rhine")]

    ents = {(r["doc_id"], r["row"]): r["entity"]
            for r in read_t2d_entity_gold(spark, f"{base}/instance").collect()}
    # dbpedia_org + /page/ normalized; rownum 1-based -> row 1 is first body row
    assert ents[("cities", 1)] == "http://dbpedia.org/resource/Amsterdam"
    assert ents[("cities", 2)] == "http://dbpedia.org/resource/Utrecht"

    props = {(r["doc_id"], r["col"]): (r["property"], r["is_key"])
             for r in read_t2d_property_gold(spark, f"{base}/property").collect()}
    assert props[("cities", 0)] == ("http://www.w3.org/2000/01/rdf-schema#label", True)
    assert props[("cities", 1)][1] is False

    cls = {r["doc_id"]: r["class"]
           for r in read_t2d_classes(spark, f"{base}/classes_GS.csv").collect()}
    assert cls == {"cities": "http://dbpedia.org/ontology/City",
                   "rivers": "http://dbpedia.org/ontology/River"}


def test_semtab_gold_loader(spark):
    """S10: SemTab layout — per-file CSV tables, ISNUMBER entity-column
    heuristic (header included in the majority vote), CEA/CTA/CPA target
    readers, and the top-1-vote CEA exporter (reference semtab.py:17-153)."""
    from takco_spark.sources.gold import (
        read_semtab_cea,
        read_semtab_cpa,
        read_semtab_cta,
        read_semtab_tables,
        semtab_entity_columns,
        to_cea_annotations,
    )

    base = "tests/data/semtab_sample"
    docs = read_semtab_tables(spark, f"{base}/tables")
    got = {r["doc_id"]: [(s["kind"], s["text"]) for s in r["spans"]]
           for r in docs.collect()}
    assert got["CTRL_SPORT_2"] == [
        ("header", "player"), ("header", "team"),
        ("cell", "Lionel Messi"), ("cell", "Barcelona"),
        ("cell", "Pele"), ("cell", "Santos"),
    ]

    ent = {(r["doc_id"], r["col"]): r["is_entity"]
           for r in semtab_entity_columns(docs).collect()}
    # city: 0/4 numeric -> entity; population: 3/4 ("123,000" matches the
    # comma-inclusive regex) -> numeric; founded: 3/4 -> numeric
    assert ent[("CTRL_CITY_1", 0)] is True
    assert ent[("CTRL_CITY_1", 1)] is False
    assert ent[("CTRL_CITY_1", 2)] is False
    assert ent[("CTRL_SPORT_2", 0)] is True and ent[("CTRL_SPORT_2", 1)] is True

    targets = read_semtab_cea(spark, f"{base}/targets/cea_targets.csv")
    assert targets.count() == 3 and targets.where("entity != ''").count() == 0
    gold = read_semtab_cea(spark, f"{base}/targets/cea_gold.csv")
    assert gold.collect()[0]["entity"].endswith("/Amsterdam")
    assert read_semtab_cta(
        spark, f"{base}/targets/cta_gold.csv"
    ).collect()[0]["class"].endswith("/City")
    cpa = read_semtab_cpa(spark, f"{base}/targets/cpa_gold.csv").collect()[0]
    assert (cpa["from_col"], cpa["to_col"]) == (0, 1)
    assert cpa["property"].endswith("populationTotal")

    # exporter: 2 votes Amsterdam vs 1 Amstelredamme on (1,0); no votes for
    # (2,0) -> dropped; vote on a non-target cell -> not exported
    preds = spark.createDataFrame(
        [("CTRL_CITY_1", 1, 0, "A1"), ("CTRL_CITY_1", 1, 0, "A1"),
         ("CTRL_CITY_1", 1, 0, "A2"), ("CTRL_CITY_1", 9, 9, "X"),
         ("CTRL_SPORT_2", 1, 0, "")],
        "doc_id string, row int, col int, entity string")
    ann = {(r["doc_id"], r["row"], r["col"]): r["entity"]
           for r in to_cea_annotations(preds, targets).collect()}
    assert ann == {("CTRL_CITY_1", 1, 0): "A1"}


def test_toughtables_gold_loader(spark):
    """S10: ToughTables CEA/CTA gold — space-separated multi-entity cells
    exploded, 1-based rows rebased, filename-regex categories, and the
    2T_WD row/col swap (reference toughtables.py:15-94)."""
    from takco_spark.sources.gold import (
        read_toughtables_cea,
        read_toughtables_cta,
    )

    base = "tests/data/toughtables_sample/gt"
    cea = read_toughtables_cea(spark, f"{base}/CEA_2T_gt.csv", part="2T")
    rows = {(r["doc_id"], r["row"], r["col"], r["entity"]): r["category"]
            for r in cea.collect()}
    # two URIs in one cell -> two rows; row 2 -> body row 1; (col, row) order
    assert ("TOUGH_T2D_001", 1, 0,
            "http://dbpedia.org/resource/Amsterdam") in rows
    assert ("TOUGH_T2D_001", 1, 0,
            "http://dbpedia.org/resource/Amsterdam_NL") in rows
    assert rows[("TOUGH_T2D_001", 1, 0,
                 "http://dbpedia.org/resource/Amsterdam")] == "TOUGH_T2D"
    assert rows[("CTRL_WIKI_005", 2, 1,
                 "http://dbpedia.org/resource/Rhine")] == "CTRL_WIKI"
    # empty entity cell dropped entirely
    assert not any(d == "TOUGH_ABC_MISSP" for d, *_ in rows)

    # 2T_WD: stored indices are swapped
    wd = read_toughtables_cea(spark, f"{base}/CEA_2T_gt.csv", part="2T_WD")
    r0 = {(r["doc_id"], r["row"], r["col"]) for r in wd.collect()}
    assert ("TOUGH_T2D_001", -1, 2) in r0  # a=0 becomes the row (0-1), b the col

    cta = read_toughtables_cta(spark, f"{base}/CTA_2T_gt.csv")
    classes = {r["class"] for r in cta.collect()}
    assert classes == {"http://dbpedia.org/ontology/City",
                       "http://dbpedia.org/ontology/Place"}


def test_limaye_gold_loader(spark):
    """S10: LimayeGS — mojibake-fixed headerless tables; entity gold located
    by (row, celltext) match recovering the column (efthymiou.py:15-71)."""
    from takco_spark.sources.gold import (
        read_limaye_cells,
        read_limaye_entity_gold,
        read_limaye_tables,
    )

    base = "tests/data/limaye_sample"
    docs = read_limaye_tables(spark, f"{base}/tables_instance")
    spans = docs.collect()[0]["spans"]
    assert [s["text"] for s in spans] == ["José", "Madrid", "Anna", "Berlin"]
    assert all(s["kind"] == "cell" for s in spans)

    cells = read_limaye_cells(spark, f"{base}/tables_instance")
    grid = {(r["row"], r["col"]): r["text"] for r in cells.collect()}
    assert grid == {(0, 0): "José", (0, 1): "Madrid",
                    (1, 0): "Anna", (1, 1): "Berlin"}

    gold = read_limaye_entity_gold(spark, f"{base}/entities_instance", cells)
    got = {(r["row"], r["col"]): r["entity"] for r in gold.collect()}
    # mojibake matched after both-side fixing; %-decoded URI; unmatched
    # celltext (NoSuchCell) dropped like the reference's warn+skip
    assert got == {(0, 0): "http://ex.org/José",
                   (1, 1): "http://ex.org/Berlin"}
