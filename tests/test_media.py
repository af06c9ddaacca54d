"""Media-reference matcher family (interleaved text+media corpora).

Two documents that embed the same media objects (images/video) are strong
duplicate candidates regardless of their text. The signal is pure exact-key
identity — no decode, no similarity kernel:

- spans.doc_media_features: (doc_id, media_refs) distinct-ref sets;
- blocking.media_blocks + cfg.blockers 'media': block on a shared ref
  (token_blocks shape, same drop/salt caps, disjoint key namespace);
- scoring.score_pairs(media=...): 'media_jacc' matcher column usable from
  the agg-expression DSL.

The synthetic corpus plants entity-keyed media refs on duplicate docs, so
media blocking alone must recover the duplicate sets.
"""

from pyspark.sql import functions as F

from takco_spark.config import PipelineConfig
from takco_spark.datagen import synth_documents
from takco_spark.operators.blocking import (
    block_documents,
    candidate_pairs,
    media_blocks,
)
from takco_spark.operators.scoring import score_pairs
from takco_spark.spans import doc_media_features, doc_text_features


def _docs(spark, n=120):
    return synth_documents(spark, n, seed=42, partitions=4)


def test_doc_media_features_shape_and_refs(spark):
    docs = _docs(spark)
    feats = doc_media_features(docs)
    assert set(feats.columns) == {"doc_id", "media_refs"}
    rows = feats.collect()
    assert len(rows) == 120
    # datagen plants exactly one media span per doc
    assert all(len(r["media_refs"]) == 1 for r in rows)
    assert all(r["media_refs"][0].startswith("m") for r in rows)
    # text-only docs yield empty sets, not nulls
    plain = spark.createDataFrame(
        [("A", [{"kind": "cell", "text": "x", "media_ref": "", "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    r = doc_media_features(plain).collect()[0]
    assert r["media_refs"] == []


def test_media_blocking_recovers_duplicate_sets(spark):
    docs = _docs(spark)
    gold = {r["doc_id"]: r["true_entity"] for r in
            docs.select("doc_id", "true_entity").collect()}
    cfg = PipelineConfig(blockers=("media",), hashed_keys=False)
    blocks, stats = block_documents(
        doc_text_features(docs, cfg.min_token_len), cfg,
        media=doc_media_features(docs))
    assert [s.blocker for s in stats] == ["media"]
    # string mode keeps the namespace prefix visible
    assert blocks.where(~F.col("block_key").startswith("med:")).count() == 0
    pairs = candidate_pairs(blocks).collect()
    assert pairs, "planted duplicates must share media refs"
    # every media-blocked pair is a true duplicate pair (refs are
    # entity-keyed for dup docs, per-doc for noise docs) ...
    assert all(gold[p["doc_id_1"]] == gold[p["doc_id_2"]] for p in pairs)
    # ... and every duplicate pair is recovered: media recall = 1.0 here
    ents = {}
    for d, e in gold.items():
        ents.setdefault(e, []).append(d)
    want = sum(len(v) * (len(v) - 1) // 2 for v in ents.values() if len(v) > 1)
    assert len(pairs) == want


def test_media_blocks_hashed_mode_and_dispatch_error(spark):
    docs = _docs(spark)
    mf = doc_media_features(docs)
    hashed = media_blocks(mf, hashed=True)
    assert dict(hashed.dtypes)["block_key"] == "bigint"
    assert hashed.count() == media_blocks(mf, hashed=False).count()
    import pytest

    cfg = PipelineConfig(blockers=("media",))
    with pytest.raises(ValueError, match="media"):
        block_documents(doc_text_features(docs, 2), cfg)


def test_media_jacc_matcher_column_and_agg_dsl(spark):
    docs = _docs(spark)
    cfg = PipelineConfig(
        blockers=("media",), hashed_keys=False, use_media=True,
        # gate entirely on the media signal: shared-ref pairs score 1.0
        agg_expr="media_jacc", agg_threshold=0.99,
    )
    feats = doc_text_features(docs, cfg.min_token_len)
    media = doc_media_features(docs)
    blocks, _ = block_documents(feats, cfg, media=media)
    scored = score_pairs(candidate_pairs(blocks), feats, cfg, media=media)
    rows = scored.collect()
    assert rows
    assert all(r["media_jacc"] == 1.0 for r in rows)
    assert all(r["agg_sim"] == 1.0 for r in rows)
    # disjoint-ref / missing-side pairs score 0, not null: score a pair of
    # docs with no shared media through a token block
    gold = {r["doc_id"]: r["true_entity"] for r in
            docs.select("doc_id", "true_entity").collect()}
    some = scored.limit(1).collect()[0]
    assert gold[some["doc_id_1"]] == gold[some["doc_id_2"]]


def test_pipeline_runs_with_media_blocker_and_matcher(spark, tmp_path):
    from takco_spark import run_pipeline

    docs = _docs(spark).select("doc_id", "spans")
    cfg = PipelineConfig(
        blockers=("token", "media"), use_media=True,
        agg_expr="@max(media_jacc, @mean(jaccard, @max(jw, lev_sim)))",
        agg_threshold=0.6,
    )
    res = run_pipeline(spark, docs, cfg)
    assert res.labelled.count() == 120
    blockers = {s["blocker"] for s in res.stats["blocking"]}
    assert blockers == {"token", "media"}
