"""The flagship ER pipeline: documents → blocks → scored pairs → components →
cluster-labelled documents.

Mirrors the reference cluster-stage lifecycle (TableSet.cluster,
/root/reference/takco/__init__.py:231-430: matcher build → block → match →
aggregate+threshold → graph partition → per-partition refinement), re-expressed
as checkpointed DataFrame stages (SURVEY.md §3 EP2, §7):

    blocks(block_key, salt, doc_id)                      checkpoint #1
    pairs_scored(doc_id_1, doc_id_2, block_key, scores…) checkpoint #2
    components(doc_id, cluster_id)                       checkpoint #3
    labelled documents (spans untouched)                 output
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from takco_spark.config import PipelineConfig
from takco_spark.operators.blocking import block_documents, candidate_pairs
from takco_spark.operators.components import (
    attach_labels,
    connected_components,
    rechunk_oversized,
)
from takco_spark.operators.scoring import score_pairs
from takco_spark.sources.checkpoint import CheckpointManager, NullCheckpointManager
from takco_spark.spans import doc_text_features


def config_token(cfg: PipelineConfig) -> str:
    """Short stable hash of the output-affecting config fields — becomes part
    of checkpoint stage paths so a changed config never resumes stale stages
    (checkpoint_dir / run_id themselves don't affect stage outputs)."""
    import dataclasses
    import hashlib
    import json

    d = dataclasses.asdict(cfg)
    d.pop("checkpoint_dir", None)
    d.pop("run_id", None)
    blob = json.dumps(d, sort_keys=True, default=str).encode()
    return hashlib.sha224(blob).hexdigest()[:12]


@dataclass
class PipelineResult:
    labelled: DataFrame                 # documents + cluster_id (spans intact)
    components: DataFrame               # (doc_id, cluster_id)
    pairs_scored: DataFrame             # scored + thresholded candidate pairs
    blocks: DataFrame                   # (block_key, salt, doc_id)
    stats: dict = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    cfg: PipelineConfig | None = None,
) -> PipelineResult:
    """Run the full record-linkage pipeline on a span-structured document
    table ``(doc_id, spans)``; extra input columns pass through to the output
    unchanged."""
    cfg = cfg or PipelineConfig()
    # Input-layout defense: a tiny single-file scan is ONE partition and
    # serializes every narrow stage up to the first shuffle; at real scale
    # the input has >= defaultParallelism splits and this is a no-op.
    from takco_spark.sources.readers import widen_input

    documents = widen_input(documents)
    ckpt = (
        CheckpointManager(spark, cfg.checkpoint_dir, cfg.run_id,
                          config_token=config_token(cfg))
        if cfg.checkpoint_dir
        else NullCheckpointManager(spark)
    )
    stats: dict = {}

    # optional exact-key pre-clustering (EP2 step 2, reference headerunions
    # fold): identical-header docs merge into union documents before
    # blocking; the fuzzy stages run on the (smaller) union universe and
    # members inherit their union's final cluster label.
    membership = None
    er_docs = documents
    if cfg.header_union:
        from takco_spark.operators.stitch import header_union_merge

        membership, er_docs = header_union_merge(
            documents, cfg.header_union_max_group)
        # both sides are consumed multiple times (features + seg features +
        # final expansion); the membership map is 2 narrow columns
        membership = membership.persist()
        er_docs = er_docs.persist()
        hu_stats = membership.agg(
            F.count("*").alias("docs"),
            F.countDistinct("rep_id").alias("unions"),
        ).first()
        stats["header_union"] = {
            "docs": hu_stats["docs"],
            "unions": hu_stats["unions"],
            "merged_away": hu_stats["docs"] - hu_stats["unions"],
        }

    features = doc_text_features(er_docs, cfg.min_token_len)
    # features feed both blocking and scoring — cache once, scan twice
    features = features.persist()

    embeddings = None
    if cfg.use_embedding or "embedding" in cfg.blockers:
        from takco_spark.operators.embedding import doc_mean_embeddings

        embeddings = doc_mean_embeddings(
            er_docs, dim=cfg.embedding_dim, seed=cfg.seed,
            min_token_len=cfg.min_token_len,
        ).persist()

    media = None
    if cfg.use_media or "media" in cfg.blockers:
        from takco_spark.spans import doc_media_features

        media = doc_media_features(er_docs).persist()

    stats_box: dict = {}

    def _blocks() -> DataFrame:
        out, st = block_documents(features, cfg, embeddings=embeddings,
                                  media=media)
        stats_box["st"] = st
        return out

    blocks = ckpt.stage("blocks", _blocks, extra_metrics={"cfg": cfg.blockers})
    # stats stay DEFERRED (operators.blocking.DeferredStats): reading them
    # is a driver sync the timed paths never pay; first access (tests,
    # diagnostics) forces one rollup aggregate off the cached key sizes.
    # A checkpoint-resumed run skipped the blocking closure entirely and
    # reports no stats, as before.
    from takco_spark.operators.blocking import DeferredStats

    stats["blocking"] = DeferredStats(
        lambda: [s.as_dict() for s in stats_box["st"]]
        if "st" in stats_box else []
    )

    def _pairs_scored() -> DataFrame:
        pairs = candidate_pairs(blocks)
        if cfg.aligned:
            from takco_spark.operators.scoring import score_pairs_aligned
            from takco_spark.spans import doc_segment_features

            # both sides of the segment-pair join (s1, s2) scan this — one
            # cache fill instead of computing the per-segment tokenize twice
            # (measured: the duplicated derivation was ~2 × 40-55 CPU-s per
            # aligned headline run before the cache)
            seg_features = doc_segment_features(
                er_docs, cfg.min_token_len).persist()
            return score_pairs_aligned(pairs, seg_features, cfg)
        return score_pairs(
            pairs, features, cfg,
            embeddings=embeddings if cfg.use_embedding else None,
            media=media if cfg.use_media else None,
        )

    pairs_scored = ckpt.stage(
        "pairs_scored",
        _pairs_scored,
        extra_metrics={"agg_expr": cfg.agg_expr, "threshold": cfg.agg_threshold},
    )
    if cfg.refine_threshold is not None and isinstance(ckpt, NullCheckpointManager):
        # refinement consumes the scored pairs a SECOND time (CC edges +
        # within-cluster sims); without a checkpoint write to re-read from,
        # the whole scoring stage would otherwise recompute — measured 2×
        # the aligned path's cost. A checkpointing run is already
        # materialized on disk, so this persist is Null-manager-only.
        pairs_scored = pairs_scored.persist()

    cc_meta: dict = {}

    def _components() -> DataFrame:
        if cfg.cluster_method == "louvain":
            # exact reference partitioning (weighted multilevel Louvain per
            # connected component — operators/louvain.py)
            from takco_spark.operators.louvain import louvain_clusters

            lres = louvain_clusters(
                pairs_scored.select("doc_id_1", "doc_id_2", "agg_sim"),
                edge_exp=cfg.louvain_edge_exp,
                max_component_size=cfg.louvain_max_component,
                max_cc_iterations=cfg.max_cc_iterations,
            )
            res = lres.cc
        else:
            edges = pairs_scored.select(
                F.col("doc_id_1").alias("src"), F.col("doc_id_2").alias("dst")
            )
            res = connected_components(edges, cfg.max_cc_iterations)
        cc_meta["iterations"] = res.iterations
        cc_meta["converged"] = res.converged
        cc_meta["edge_counts"] = res.edge_counts
        labels = lres.labels if cfg.cluster_method == "louvain" else res.labels
        if cfg.max_cluster_size:
            # rechunk scans its input 3× (sizes, big, small anti-join); the
            # label set is 2 narrow columns — persist beats recomputing the
            # CC union+distinct from the checkpointed edge set each scan
            labels = rechunk_oversized(labels.persist(), cfg.max_cluster_size)
        return labels

    components = ckpt.stage("components", _components)
    stats["cc"] = cc_meta
    if cfg.refine_threshold is not None and isinstance(ckpt, NullCheckpointManager):
        # refine_clusters scans the coarse labels 4× (size guard + joins)
        components = components.persist()

    if cfg.refine_threshold is not None:
        from takco_spark.operators.refine import refine_clusters

        def _refined() -> DataFrame:
            # With the G2 rechunk on, every incoming cluster is already
            # bounded at max_cluster_size, so refine's own guard could drop
            # exactly nothing — skip its sizes scan + broadcast joins
            # (guard=None). Belt-and-braces guard only when the rechunk is
            # disabled (max_cluster_size=0).
            guard = None if cfg.max_cluster_size else 1000
            refined = refine_clusters(
                components.select("doc_id", "cluster_id"),
                pairs_scored.select("doc_id_1", "doc_id_2", "agg_sim"),
                threshold=cfg.refine_threshold,
                max_group_size=guard,
            )
            return refined.select(
                "doc_id", F.col("refined_id").alias("cluster_id")
            )

        components = ckpt.stage("components_refined", _refined)

    if membership is not None:
        # expand union labels back to every member document
        components = (
            membership.join(
                components.select(F.col("doc_id").alias("rep_id"),
                                  "cluster_id"),
                "rep_id",
            ).select("doc_id", "cluster_id")
        )

    labelled = attach_labels(documents, components)
    return PipelineResult(
        labelled=labelled,
        components=components,
        pairs_scored=pairs_scored,
        blocks=blocks,
        stats=stats,
    )
