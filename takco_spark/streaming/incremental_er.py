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
    labels/batch=<id>/     (doc_id, cluster_id)       DELTA per batch: new
                           docs + docs whose cluster changed (r6 — the r5
                           layout wrote a FULL O(corpus) snapshot per
                           arrival, which dominates per-batch cost at
                           stream age; readers merge-on-read via
                           latest_labels, newest batch per doc wins)
    {features,blocks,labels}/_base/epoch=<k>/  compacted state <= k
                           (written by compact_state; readers prefer the
                           newest complete epoch below their replay horizon
                           and only scan deltas ABOVE it — for labels the
                           epoch is the fully-merged snapshot as of k)

Without compaction the per-batch read fan-in grows O(#batches) — file
listings, parquet footers, and union width all scale with stream age, which
is untenable for a long-lived 10^12-doc ingest. ``compact_state`` is the
parquet stand-in for Iceberg's ``rewrite_data_files`` + ``expire_snapshots``
maintenance pair and keeps every batch's reads O(1 epoch + recent deltas).

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
    """State visible to a batch: the newest complete ``_base/epoch=<k>``
    with k < before_batch (if any), plus the batch=<id> delta dirs with
    epoch < id < before_batch. A crashed later batch's half-written dir has
    no _SUCCESS and is invisible to the replay that must not see it; a
    half-finished compaction is likewise invisible (epoch commits via its
    own _SUCCESS, and leftover deltas <= epoch are simply ignored)."""
    epochs = [e for e in _epoch_ids(f"{root}/_base") if e < before_batch]
    base = max(epochs) if epochs else None
    deltas = [
        i for i in _batch_ids(root)
        if i < before_batch and (base is None or i > base)
    ]
    parts = []
    if base is not None:
        parts.append(spark.read.parquet(f"{root}/_base/epoch={base}"))
    if deltas:
        parts.append(
            spark.read.option("basePath", root)
            .parquet(*[f"{root}/batch={i}" for i in deltas])
            .drop("batch")
        )
    if not parts:
        return spark.createDataFrame([], schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _complete_ids(root: str, prefix: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    out = []
    for e in os.scandir(root):
        if e.is_dir() and e.name.startswith(prefix) and os.path.exists(
            os.path.join(e.path, "_SUCCESS")
        ):
            out.append(int(e.name.split("=", 1)[1]))
    return sorted(out)


def _batch_ids(root: str) -> list[int]:
    return _complete_ids(root, "batch=")


def _epoch_ids(base_root: str) -> list[int]:
    return _complete_ids(base_root, "epoch=")


def compact_state(spark: SparkSession, state_dir: str,
                  through_batch: int | None = None) -> dict:
    """Compact the incremental-linkage state THROUGH a batch id: merge all
    feature/block deltas with id <= through into one ``_base/epoch=<k>``
    dir each, then drop the merged deltas, older epochs, and label
    snapshots below k. The parquet stand-in for Iceberg's
    ``rewrite_data_files`` + ``expire_snapshots`` maintenance pair.

    Default ``through_batch`` is the SECOND-newest complete label snapshot:
    Structured Streaming can only replay the batch after its last committed
    offset (the newest one here), and that replay must still be able to read
    state strictly below itself — so the newest batch is never folded in.
    Passing an explicit ``through_batch`` >= the newest label snapshot is
    rejected for the same reason.

    Crash-safe at every point: the epoch write commits via its _SUCCESS
    (readers ignore incomplete epochs), after which leftover deltas <= k are
    dead weight readers already skip — the deletion phase is pure cleanup
    and idempotent. Re-running with the same k short-circuits the write.
    """
    label_ids = _batch_ids(f"{state_dir}/labels")
    if through_batch is None:
        if len(label_ids) < 2:
            return {"compacted_through": None, "reason": "nothing to compact"}
        through_batch = label_ids[-2]
    k = through_batch
    if k not in label_ids:
        raise ValueError(
            f"no complete label snapshot for batch {k}; have {label_ids}")
    if k >= label_ids[-1]:
        raise ValueError(
            f"refusing to compact through the newest batch {label_ids[-1]} "
            "— a streaming replay of it could no longer read prior state")

    import shutil

    stats: dict = {"compacted_through": k}
    for sub in ("features", "blocks"):
        root = f"{state_dir}/{sub}"
        base_root = f"{root}/_base"
        delta_ids = [i for i in _batch_ids(root) if i <= k]
        epoch_ids = _epoch_ids(base_root)
        if k not in epoch_ids:
            if not delta_ids and not epoch_ids:
                stats[sub] = {"deltas_merged": 0, "skipped": True}
                continue
            # schema arg is only used for the no-input case, excluded above
            merged = _read_deltas(spark, root, "doc_id string", k + 1)
            merged.write.mode("overwrite").parquet(f"{base_root}/epoch={k}")
        stats[sub] = {"deltas_merged": len(delta_ids),
                      "epochs_dropped": len([e for e in epoch_ids if e < k])}
        for i in delta_ids:
            shutil.rmtree(f"{root}/batch={i}", ignore_errors=True)
        for e in epoch_ids:
            if e < k:
                shutil.rmtree(f"{base_root}/epoch={e}", ignore_errors=True)
    # labels: fold every delta <= k into one fully-merged snapshot
    # ``labels/_base/epoch=<k>`` (merge-on-read readers then scan one epoch
    # plus the deltas above it), then drop the folded deltas and older
    # epochs. The epoch commits via its _SUCCESS before any delete, and the
    # newest delta (k is at most the second-newest) stays untouched, so a
    # crash-replay of the newest batch still reads valid state < itself.
    lbl_base = f"{state_dir}/labels/_base"
    if k not in _epoch_ids(lbl_base):
        latest_labels(spark, state_dir, before_batch=k + 1).write.mode(
            "overwrite"
        ).parquet(f"{lbl_base}/epoch={k}")
    dropped = [i for i in label_ids if i < k]
    for i in dropped:
        shutil.rmtree(f"{state_dir}/labels/batch={i}", ignore_errors=True)
    for e in _epoch_ids(lbl_base):
        if e < k:
            shutil.rmtree(f"{lbl_base}/epoch={e}", ignore_errors=True)
    stats["label_snapshots_dropped"] = len(dropped)
    return stats


def latest_labels(spark: SparkSession, state_dir: str,
                  before_batch: int | None = None) -> DataFrame:
    """The merged label view (strictly before ``before_batch`` when given —
    what a replayed batch must read): newest complete ``_base/epoch=<k>``
    full snapshot plus every per-batch DELTA above it, reduced to each doc's
    latest assignment (the newest batch id wins — a doc appears in at most
    one row per delta, so the reduction is deterministic). r6: label state
    is written O(delta) per batch (see :func:`link_batch`); this view is the
    merge-on-read side of that trade."""
    root = f"{state_dir}/labels"
    epochs = [e for e in _epoch_ids(f"{root}/_base")
              if before_batch is None or e < before_batch]
    base = max(epochs) if epochs else None
    ids = [
        i for i in _batch_ids(root)
        if (before_batch is None or i < before_batch)
        and (base is None or i > base)
    ]
    parts = []
    if base is not None:
        parts.append(
            spark.read.parquet(f"{root}/_base/epoch={base}")
            .select("doc_id", "cluster_id", F.lit(base).alias("_b"))
        )
    if ids:
        parts.append(
            spark.read.option("basePath", root)
            .parquet(*[f"{root}/batch={i}" for i in ids])
            .select("doc_id", "cluster_id",
                    F.col("batch").cast("int").alias("_b"))
        )
    if not parts:
        return spark.createDataFrame([], "doc_id string, cluster_id string")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("doc_id").agg(
        F.max_by("cluster_id", "_b").alias("cluster_id")
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

    # -- transitive label update, O(affected) per batch (r6): a component of
    # (new edges ∪ prior assignments) that contains no new-edge endpoint is
    # an unchanged prior cluster — its members keep their labels, so only
    # clusters REACHED by a new edge need to enter CC at all, and only new
    # or re-labelled docs need to be written. (Cluster ids are themselves
    # member doc ids — the CC min label — so restricting the assignment
    # edges to affected clusters preserves every merged component's min
    # exactly; the r5 shape fed ALL prior assignments to CC and wrote a
    # FULL O(corpus) snapshot per arrival, the documented per-batch floor.)
    # eager localCheckpoint on the edge set: CC's self-joining rounds must
    # not stack onto the deep scoring plan (also trips a Catalyst 4.1
    # attribute-resolution bug, NoSuchElementException key-not-found, when
    # the star-round self-joins stack onto this union un-materialized).
    new_edges = scored.select(
        F.col("doc_id_1").alias("src"), F.col("doc_id_2").alias("dst")
    ).localCheckpoint()
    old_labels = old_labels.persist()
    endpoints = (
        new_edges.select(F.col("src").alias("doc_id"))
        .unionByName(new_edges.select(F.col("dst").alias("doc_id")))
        .distinct()
    )
    affected = old_labels.join(
        old_labels.join(endpoints, "doc_id", "left_semi")
        .select("cluster_id").distinct(),
        "cluster_id", "left_semi",
    )
    label_edges = affected.select(
        F.col("doc_id").alias("src"), F.col("cluster_id").alias("dst")
    )
    labels = connected_components(
        new_edges.unionByName(label_edges).localCheckpoint(),
        cfg.max_cc_iterations,
    ).labels
    updated_ids = new_ids.unionByName(affected.select("doc_id")).distinct()
    full_updated = updated_ids.join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )
    delta = (
        full_updated.join(
            old_labels.select("doc_id", F.col("cluster_id").alias("_prev")),
            "doc_id", "left",
        )
        .where(F.col("_prev").isNull()
               | (F.col("_prev") != F.col("cluster_id")))
        .select("doc_id", "cluster_id")
    )

    # -- the batch's commit point: the label DELTA (new + re-labelled docs
    # only; deltas were written above; a replay overwrites all three
    # batch=<id> dirs and recomputes the identical delta from state < id)
    delta.write.mode("overwrite").parquet(
        f"{state_dir}/labels/batch={batch_id}"
    )
    old_labels.unpersist()
    return latest_labels(spark, state_dir, before_batch=batch_id + 1)


def incremental_er_stream(
    spark: SparkSession,
    landing_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    max_files_per_trigger: int = 64,
    available_now: bool = True,
    compact_every: int = 0,
):
    """readStream JSONL documents → per-micro-batch incremental linkage.

    foreachBatch + per-batch-dir idempotent writes give effective
    exactly-once state maintenance across restarts (a replayed batch
    overwrites its own directories and reads only earlier ones).
    ``compact_every=n`` folds state maintenance into the stream itself:
    after every n-th batch commits, deltas below it are compacted into a
    base epoch (see :func:`compact_state`) — compaction never touches the
    just-committed batch, so a crash-replay of it stays valid."""
    src = (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(landing_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        link_batch(spark, batch_df, state_dir, batch_id, cfg)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_state(spark, state_dir)

    writer = (
        src.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
