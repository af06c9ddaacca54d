"""Incremental record linkage over a document stream.

The batch pipeline (plans/pipeline.py) re-clusters a full corpus; a
continuously-ingesting deployment cannot afford that per arrival. This module
is the streaming twin: ``readStream`` micro-batches of new documents are
linked INCREMENTALLY against everything seen so far —

1. features of the new batch are computed (same doc_text_features algebra);
2. the new docs' block keys are matched against a persisted BLOCK INDEX
   (block_key → doc_id of every prior doc), so each batch pays
   O(new_keys ⋈ index), never O(corpus²) — the stream analog of the batch
   blocking join. New-vs-new pairs come from the batch's own blocks;
3. candidate pairs are scored with the standard matcher suite
   (operators.scoring.score_pairs) against the union of new + stored
   features;
4. cluster labels are updated TRANSITIVELY: connected components run over
   (new edges) ∪ (prior doc→cluster assignments as edges), so a new document
   that bridges two existing clusters merges them — exactly the result a
   full batch re-run would produce for single-linkage clustering, at
   per-batch cost. (CC over accepted-edge union is associative:
   labels(E₁∪E₂) = labels(labels(E₁) ∪ E₂); the invariant the test pins.)

State layout (``state_dir``; parquet in the sandbox, Iceberg tables at
cluster scale — same downgrade story as sources/checkpoint.py). EVERY write
targets a ``batch=<id>`` directory, so a foreachBatch REPLAY after a crash
overwrites its own directories and reads only ``batch < id`` state — the
prior state is never destroyed, and re-running a batch is idempotent (the
parquet-level stand-in for Iceberg snapshot isolation):

    features/batch=<id>/   (doc_id, name, tokens[, media_refs])  delta/batch
    blocks/batch=<id>/     (block_key, doc_id)        delta per batch
                           (union of the cfg.blockers key streams —
                           token/minhash/media, all deterministic per doc)
    labels/batch=<id>/     (doc_id, cluster_id)       FULL snapshot per batch
                           (prune old snapshots out-of-band; latest complete
                           snapshot below the current batch is the input)

Reference scope note: the reference has no streaming surface (SURVEY.md
§2.9) — this is part of the engine's Spark-native extension for continuous
web-scale ingestion, like streaming/ingest.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from takco_spark.config import PipelineConfig
from takco_spark.operators.blocking import (
    apply_block_caps,
    candidate_pairs,
    media_blocks,
    minhash_blocks,
    token_blocks,
)
from takco_spark.operators.components import connected_components
from takco_spark.operators.scoring import score_pairs
from takco_spark.spans import DOCUMENT_SCHEMA, doc_media_features, doc_text_features


def _batch_blocks(new_feats: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """The batch's block-key delta: union of cfg.blockers key streams.

    Every supported blocker is a DETERMINISTIC per-doc key function (same
    doc → same keys in any batch), which is exactly what makes the persisted
    block index valid across batches. Deviation from the batch pipeline,
    documented: batch-mode MinHash excludes corpus-global hot tokens from
    signatures (block_documents derives the list from the full token
    stream); a stream has no finished corpus to derive it from, so
    incremental MinHash signs ALL tokens — increment ≡ batch exactly when no
    token exceeds max_block_size, and the union-level caps still bound every
    key either way. 'embedding' needs a per-batch embeddings table and its
    own feature state — run the batch pipeline for it.
    """
    unsupported = set(cfg.blockers) - {"token", "minhash", "media"}
    if unsupported:
        raise ValueError(
            f"incremental linkage supports blockers token/minhash/media; got "
            f"{sorted(unsupported)} — use plans.pipeline.run_pipeline for these")
    parts = []
    if "token" in cfg.blockers:
        parts.append(token_blocks(new_feats, cfg, hashed=cfg.hashed_keys))
    if "minhash" in cfg.blockers:
        parts.append(minhash_blocks(new_feats, cfg, hashed=cfg.hashed_keys))
    if "media" in cfg.blockers:
        # media_refs ride the feature delta (media_on in link_batch), so the
        # key stream reads the already-parsed refs, not the spans again
        parts.append(media_blocks(new_feats.select("doc_id", "media_refs"),
                                  hashed=cfg.hashed_keys))
    if not parts:
        raise ValueError("cfg.blockers is empty")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _read_deltas(spark: SparkSession, root: str, schema: str,
                 before_batch: int) -> DataFrame:
    """Union of all batch=<id> delta dirs with id < before_batch (partition
    pruning does the filtering — only the wanted dirs are listed/scanned).
    A crashed later batch's half-written dir is thereby invisible to the
    replay that must not see it."""
    complete = [
        e for e in _batch_ids(root) if e < before_batch
    ]
    if not complete:
        return spark.createDataFrame([], schema)
    return (
        spark.read.option("basePath", root)
        .parquet(*[f"{root}/batch={i}" for i in complete])
        .drop("batch")
    )


def _batch_ids(root: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    out = []
    for e in os.scandir(root):
        if e.is_dir() and e.name.startswith("batch=") and os.path.exists(
            os.path.join(e.path, "_SUCCESS")
        ):
            out.append(int(e.name.split("=", 1)[1]))
    return sorted(out)


def latest_labels(spark: SparkSession, state_dir: str,
                  before_batch: int | None = None) -> DataFrame:
    """The most recent COMPLETE label snapshot (strictly before
    ``before_batch`` when given — what a replayed batch must read)."""
    root = f"{state_dir}/labels"
    ids = _batch_ids(root)
    if before_batch is not None:
        ids = [i for i in ids if i < before_batch]
    if not ids:
        return spark.createDataFrame([], "doc_id string, cluster_id string")
    return spark.read.parquet(f"{root}/batch={ids[-1]}").select(
        "doc_id", "cluster_id"
    )


def link_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    batch_id: int,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """Link ONE micro-batch of documents against the accumulated state and
    return the updated full label table (doc_id, cluster_id).

    This is the foreachBatch body, callable directly for batch-shaped
    incremental loads (e.g. a nightly delta) — the streaming entry point
    below just wires it to a readStream source. ``batch_id`` must be
    strictly increasing across calls (Structured Streaming guarantees it).
    """
    cfg = cfg or PipelineConfig(blockers=("token",))
    media_on = cfg.use_media or "media" in cfg.blockers
    # the feature delta carries media_refs when the media matcher/blocker is
    # on (old docs' refs must survive into later batches' scoring joins);
    # cfg must be stable across a state_dir's batches — same contract as the
    # checkpoint manager's config token in the batch pipeline
    feat_schema = ("doc_id string, name string, tokens array<string>"
                   + (", media_refs array<string>" if media_on else ""))
    block_schema = (
        "block_key bigint, doc_id string" if cfg.hashed_keys
        else "block_key string, doc_id string"
    )

    # -- write this batch's feature/block deltas FIRST (idempotent per-batch
    # dirs), then operate on the parquet-backed reads: clean scan plans (no
    # logical self-references into the un-materialized batch frame), and the
    # labels snapshot below stays the batch's commit point — a crash between
    # these writes and the snapshot replays harmlessly.
    feats_delta = doc_text_features(
        batch.select("doc_id", "spans"), cfg.min_token_len
    )
    if media_on:
        feats_delta = feats_delta.join(
            doc_media_features(batch.select("doc_id", "spans")), "doc_id"
        )
    feats_delta.write.mode("overwrite").parquet(
        f"{state_dir}/features/batch={batch_id}")
    new_feats = spark.read.parquet(f"{state_dir}/features/batch={batch_id}")
    _batch_blocks(new_feats, cfg).write.mode(
        "overwrite"
    ).parquet(f"{state_dir}/blocks/batch={batch_id}")
    new_blocks = spark.read.parquet(f"{state_dir}/blocks/batch={batch_id}")

    old_feats = _read_deltas(spark, f"{state_dir}/features", feat_schema,
                             batch_id)
    old_blocks = _read_deltas(spark, f"{state_dir}/blocks", block_schema,
                              batch_id)
    old_labels = latest_labels(spark, state_dir, before_batch=batch_id)

    # -- blocking: new-vs-new from the batch's own keys; new-vs-old via the
    # block index, with the batch's (small) distinct key set broadcast as the
    # join driver. At scale the index side is an Iceberg table bucketed on
    # block_key (partition-pruned scan); the cap pass below bounds the worst
    # key exactly like the batch path (drop + salt, stats observable).
    hits = old_blocks.join(
        F.broadcast(new_blocks.select("block_key").distinct()), "block_key"
    )
    capped, _stats = apply_block_caps(
        new_blocks.unionByName(hits), cfg, blocker="incremental"
    )
    # keep pairs where at least one side is NEW (old-old pairs were linked in
    # prior batches; re-scoring them is pure waste). One pass with two
    # broadcast membership joins — no self-union, no distinct.
    new_ids = new_feats.select("doc_id")
    n1 = new_ids.select(F.col("doc_id").alias("doc_id_1"),
                        F.lit(True).alias("_n1"))
    n2 = new_ids.select(F.col("doc_id").alias("doc_id_2"),
                        F.lit(True).alias("_n2"))
    pairs = (
        candidate_pairs(capped)
        .join(F.broadcast(n1), "doc_id_1", "left")
        .join(F.broadcast(n2), "doc_id_2", "left")
        .where(F.col("_n1").isNotNull() | F.col("_n2").isNotNull())
        .drop("_n1", "_n2")
    )

    all_feats = old_feats.unionByName(new_feats)
    scored = score_pairs(
        pairs, all_feats, cfg,
        media=(all_feats.select("doc_id", "media_refs")
               if cfg.use_media else None),
    )

    # -- transitive label update: prior assignments enter as edges, so a new
    # bridge document merges existing clusters (single-linkage semantics)
    new_edges = scored.select(
        F.col("doc_id_1").alias("src"), F.col("doc_id_2").alias("dst")
    )
    label_edges = old_labels.select(
        F.col("doc_id").alias("src"), F.col("cluster_id").alias("dst")
    )
    # eager localCheckpoint: the accepted edge set is small (cap-bounded per
    # key, one batch's worth + one row per prior doc) and CC's self-joining
    # rounds iterate over it — cutting lineage here keeps those rounds off
    # the deep scoring plan (which also trips a Catalyst 4.1
    # attribute-resolution bug, NoSuchElementException key-not-found, when
    # the star-round self-joins stack onto this union un-materialized).
    labels = connected_components(
        new_edges.unionByName(label_edges).localCheckpoint(),
        cfg.max_cc_iterations,
    ).labels
    all_ids = old_labels.select("doc_id").unionByName(new_ids).distinct()
    full = all_ids.join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )

    # -- the batch's commit point: the full label snapshot (deltas were
    # written above; a replay overwrites all three batch=<id> dirs)
    full.write.mode("overwrite").parquet(
        f"{state_dir}/labels/batch={batch_id}"
    )
    return spark.read.parquet(f"{state_dir}/labels/batch={batch_id}")


def incremental_er_stream(
    spark: SparkSession,
    landing_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    max_files_per_trigger: int = 64,
    available_now: bool = True,
):
    """readStream JSONL documents → per-micro-batch incremental linkage.

    foreachBatch + per-batch-dir idempotent writes give effective
    exactly-once state maintenance across restarts (a replayed batch
    overwrites its own directories and reads only earlier ones)."""
    src = (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(landing_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        link_batch(spark, batch_df, state_dir, batch_id, cfg)

    writer = (
        src.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
