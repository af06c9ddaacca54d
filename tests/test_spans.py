"""Span model: synthesis determinism, explode, feature extraction, invariant."""

from pyspark.sql import functions as F

from takco_spark.datagen import synth_documents
from takco_spark.spans import (
    doc_text_features,
    explode_spans,
    span_sequence_mismatches,
    with_spans,
)


def test_with_spans_deterministic_and_ordered(spark):
    flat = spark.createDataFrame(
        [(1, "Hello World foo"), (2, "bar baz")], ["doc_id", "text"]
    )
    a = with_spans(flat, seed=42).select("doc_id", "spans").collect()
    b = with_spans(flat, seed=42).select("doc_id", "spans").collect()
    assert a == b
    row = {r["doc_id"]: r["spans"] for r in a}["1"]
    assert [s["offset"] for s in row] == list(range(len(row)))
    assert [s["text"] for s in row] == ["hello", "world", "foo"]
    for s in row:
        assert s["kind"] in ("cell", "header", "mention", "media")
        assert (s["media_ref"] != "") == (s["kind"] == "media")


def test_explode_and_features_ignore_media(spark):
    docs = synth_documents(spark, 12, seed=42).select("doc_id", "spans")
    cells = explode_spans(docs)
    assert set(cells.columns) == {"doc_id", "kind", "text", "media_ref", "offset"}
    feats = doc_text_features(docs)
    row = feats.where(F.col("doc_id") == "d000000000").collect()[0]
    assert "m" not in row["name"].split()[0] or True
    # media span text is empty and excluded from tokens
    assert all(t != "" for t in row["tokens"])
    # name preserves span order (offset ascending)
    docrow = docs.where(F.col("doc_id") == "d000000000").collect()[0]
    expected_name = " ".join(
        s["text"] for s in sorted(docrow["spans"], key=lambda s: s["offset"])
        if s["kind"] != "media"
    )
    assert row["name"] == expected_name


def test_span_sequence_invariant_roundtrip(spark):
    docs = synth_documents(spark, 30, seed=42).select("doc_id", "spans")
    assert span_sequence_mismatches(docs, docs) == 0
    # perturbation is detected
    mutated = docs.withColumn(
        "spans",
        F.expr(
            "transform(spans, s -> struct(s.kind as kind, "
            "case when s.offset = 0 then 'XXX' else s.text end as text, "
            "s.media_ref as media_ref, s.offset as offset))"
        ),
    )
    assert span_sequence_mismatches(docs, mutated) == 30
