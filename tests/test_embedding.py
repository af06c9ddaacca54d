"""F11 embedding features + matcher/blocker (reference EmbeddingMatcher,
/root/reference/takco/cluster/matchers/embedding.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from takco_spark.config import PipelineConfig
from takco_spark.datagen import synth_documents
from takco_spark.operators.embedding import (
    doc_mean_embeddings,
    embedding_blocks,
)
from takco_spark.plans.metrics import pairwise_f1
from takco_spark.plans.pipeline import run_pipeline


def _doc(doc_id, texts):
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": "cell", "text": t, "media_ref": "", "offset": i}
            for i, t in enumerate(texts)
        ],
    }


def test_doc_mean_embedding_arithmetic_with_wordvec_table(spark):
    """vec(doc) = mean over spans of (sum of word vecs of span tokens) —
    verified against hand numpy (reference get_vec, embedding.py:88-101)."""
    docs = spark.createDataFrame([
        _doc("a", ["red apple", "green pear"]),
        _doc("b", ["red"]),
    ])
    vocab = {"red": [1.0, 0.0], "apple": [0.0, 2.0],
             "green": [3.0, 0.0], "pear": [0.0, 4.0]}
    wv = spark.createDataFrame(
        [(k, v) for k, v in vocab.items()], "token string, vec array<double>"
    )
    out = {r["doc_id"]: r["emb"]
           for r in doc_mean_embeddings(docs, word_vecs=wv, min_token_len=2).collect()}
    # doc a: span0 = red+apple = [1,2]; span1 = green+pear = [3,4]; mean [2,3]
    assert np.allclose(out["a"], [2.0, 3.0])
    assert np.allclose(out["b"], [1.0, 0.0])


def test_hash_embeddings_deterministic_and_token_sensitive(spark):
    docs = spark.createDataFrame([
        _doc("x", ["alpha beta"]), _doc("y", ["alpha beta"]),
        _doc("z", ["gamma delta"]),
    ])
    emb = {r["doc_id"]: np.array(r["emb"])
           for r in doc_mean_embeddings(docs, dim=8, seed=1).collect()}
    assert np.allclose(emb["x"], emb["y"])  # same tokens → same vector
    assert not np.allclose(emb["x"], emb["z"])
    assert len(emb["x"]) == 8


def test_embedding_blocker_recalls_identical_docs(spark):
    """Docs with equal embeddings always share every bucket; near-identical
    planted dups share ≥ one of the 4 hyperplane tables w.h.p."""
    docs = synth_documents(spark, 60, seed=42).select("doc_id", "spans")
    emb = doc_mean_embeddings(docs, dim=16, seed=42).persist()
    blocks = embedding_blocks(emb, dim=16, n_bits=8, seed=42)
    pairs = (
        blocks.alias("a").join(blocks.alias("b"), "block_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    got = {(r["d1"], r["d2"]) for r in pairs.collect()}
    # exact-duplicate variants (v0 vs token-swap v2 have identical token SETS
    # → identical mean embeddings) must co-block
    from takco_spark.datagen import expected_clusters_py
    gold = expected_clusters_py(60)
    same = [
        (a, b) for a in gold for b in gold
        if a < b and gold[a] == gold[b]
    ]
    assert same, "fixture must plant dups"
    recalled = sum((a, b) in got for a, b in same)
    assert recalled / len(same) >= 0.5, f"{recalled}/{len(same)}"


def test_pipeline_with_embedding_blocker_and_matcher(spark):
    """Flagship with the third blocker + emb_cos in the agg keeps F1 = 1 on
    the planted corpus (blocker/matcher are additive, not disruptive)."""
    docs = synth_documents(spark, 120, seed=42).persist()
    gold = docs.select("doc_id", "true_entity")
    # emb_cos LIFTS an existing token signal rather than creating one: hash
    # projections (unlike trained vectors) give unrelated docs nonzero cosine
    # noise (~1/sqrt(dim)), so gating on jaccard stays the right agg shape
    cfg = PipelineConfig(
        blockers=("token", "minhash", "embedding"),
        use_embedding=True,
        embedding_dim=32,
        agg_expr="@mean(jaccard, @max(jw, lev_sim, emb_cos))",
        agg_threshold=0.6,
        max_block_size=60,
        salt_threshold=24,
    )
    res = run_pipeline(spark, docs.select("doc_id", "spans"), cfg)
    prf = pairwise_f1(res.components, gold)
    assert prf.f1 >= 0.99, prf.as_dict()
    # emb_cos column flowed through scoring
    assert "emb_cos" in res.pairs_scored.columns
    row = res.pairs_scored.agg(
        F.min("emb_cos").alias("lo"), F.max("emb_cos").alias("hi")).first()
    assert 0.0 <= row["lo"] <= row["hi"] <= 1.0 + 1e-9
    # per-blocker stats include the embedding blocker
    assert any(s["blocker"] == "embedding" for s in res.stats["blocking"])
