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
