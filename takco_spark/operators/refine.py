"""Within-partition agglomerative refinement (SURVEY.md G3).

Reference: after graph partitioning, columns inside each partition are
clustered with complete-linkage agglomerative clustering on distance 1−sim,
with intra-table links forbidden (cluster_partition_columns / cluster_columns,
/root/reference/takco/cluster/cluster.py:434-529,652-689; sklearn
AgglomerativeClustering per partition).

Spark shape: connected components give coarse partitions (bounded by the
max-cluster-size rechunk, G2); each partition's refinement is an independent
small problem → ``applyInPandas`` per component, a self-contained numpy
complete-linkage inside (no sklearn in this environment — the linkage loop is
O(k³) on k ≤ max_cluster_size items, which the G2 bound keeps tiny).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REFINE_SCHEMA = "doc_id string, cluster_id string, refined_id string"


def _complete_linkage(items: list[str], sims: dict[tuple[str, str], float],
                      forbid: dict[str, str], threshold: float) -> dict[str, int]:
    """Complete-linkage agglomeration: merge the closest pair of clusters
    while max inter-cluster distance (1 - min sim) stays <= 1 - threshold and
    no two members share a forbidden group. Deterministic tie-breaks."""
    clusters: list[list[str]] = [[x] for x in sorted(items)]

    def link_sim(a: list[str], b: list[str]) -> float:
        best = 1.0
        for x in a:
            for y in b:
                if forbid.get(x) is not None and forbid.get(x) == forbid.get(y):
                    return -1.0  # intra-source link forbidden
                key = (x, y) if x < y else (y, x)
                best = min(best, sims.get(key, 0.0))
        return best

    while len(clusters) > 1:
        best_pair, best_sim = None, threshold
        for i in range(len(clusters)):
            for j in range(i + 1, len(clusters)):
                s = link_sim(clusters[i], clusters[j])
                if s >= best_sim and (
                    best_pair is None
                    or s > best_sim
                    or (clusters[i][0], clusters[j][0])
                    < (clusters[best_pair[0]][0], clusters[best_pair[1]][0])
                ):
                    best_pair, best_sim = (i, j), s
        if best_pair is None:
            break
        i, j = best_pair
        clusters[i] = sorted(clusters[i] + clusters[j])
        del clusters[j]

    out: dict[str, int] = {}
    for ci, members in enumerate(sorted(clusters)):
        for m in members:
            out[m] = ci
    return out


def refine_clusters(
    labels: DataFrame,
    pair_sims: DataFrame,
    threshold: float = 0.8,
    source_col: str | None = None,
    max_group_size: int | None = 1000,
) -> DataFrame:
    """Split coarse CC clusters with complete-linkage at a stricter threshold.

    labels(doc_id, cluster_id [, source]) + pair_sims(doc_id_1, doc_id_2,
    agg_sim) → (doc_id, cluster_id, refined_id). refined_id =
    '{cluster_id}/{k}'. Transitive chains that CC merged but whose weakest
    link is below ``threshold`` split apart — the reference runs exactly this
    two-stage coarse→strict scheme (Louvain partition, then per-partition
    agglomerative at agg_threshold_col).

    Size guard: a coarse cluster with more than ``max_group_size`` members
    (a giant component — the known CC failure mode on a too-loose threshold)
    would pack O(k²) sims into one applyInPandas group and run an O(k³)
    linkage; such clusters PASS THROUGH unrefined (refined_id =
    '{cluster_id}/0'). The skip is observable via
    :func:`oversized_refine_stats` — never silent.
    ``max_group_size=None`` disables the guard entirely — for callers that
    ALREADY bound every cluster (the pipeline runs refine after the G2
    rechunk, whose slices can never exceed ``cfg.max_cluster_size``, so the
    guard's sizes scan and the two broadcast joins would drop exactly
    nothing; r6 measured them as pure fixed cost on the aligned headline).
    """
    if max_group_size is None:
        passthrough = None
    else:
        sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("_csize"))
        big_ids = sizes.where(
            F.col("_csize") > max_group_size).select("cluster_id")
        passthrough = labels.join(F.broadcast(big_ids), "cluster_id").select(
            "doc_id",
            "cluster_id",
            F.concat(F.col("cluster_id"), F.lit("/0")).alias("refined_id"),
        )
        labels = labels.join(F.broadcast(big_ids), "cluster_id", "left_anti")
    l1 = labels.select(
        F.col("doc_id").alias("doc_id_1"), F.col("cluster_id")
    )
    sims_in_cluster = (
        pair_sims.join(l1, "doc_id_1")
        .select("cluster_id", "doc_id_1", "doc_id_2", "agg_sim")
    )
    cols = ["doc_id", "cluster_id"] + ([source_col] if source_col else [])
    members = labels.select(*cols)

    def run(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:  # sims for a cluster with no member rows: nothing
            return pd.DataFrame(
                {"doc_id": [], "cluster_id": [], "refined_id": []}
            )
        cluster_id = left["cluster_id"].iloc[0]
        items = left["doc_id"].tolist()
        forbid = (
            dict(zip(left["doc_id"], left[source_col])) if source_col else {}
        )
        sims: dict[tuple[str, str], float] = {}
        for a, b, s in zip(right["doc_id_1"], right["doc_id_2"],
                           right["agg_sim"]):
            key = (a, b) if a < b else (b, a)
            sims[key] = max(sims.get(key, 0.0), float(s))
        assign = _complete_linkage(items, sims, forbid, threshold)
        return pd.DataFrame(
            {
                "doc_id": items,
                "cluster_id": [cluster_id] * len(items),
                "refined_id": [f"{cluster_id}/{assign[x]}" for x in items],
            }
        )

    # one COGROUP per coarse cluster: members and sims each shuffle ONCE as
    # rows (a collect_list-then-join would copy the O(k²) sims payload onto
    # every member row — k× duplication before the grouping); group payload
    # stays bounded by max_group_size
    sims_side = sims_in_cluster.select(
        F.col("cluster_id").alias("_cid"), "doc_id_1", "doc_id_2", "agg_sim"
    )  # renamed key: both cogroup sides descend from `labels`, and Spark
    # rejects the ambiguous self-referenced grouping column otherwise
    #
    # Pin the group shuffle's partition count: per-group cost here is O(k³)
    # PYTHON compute on a few hundred BYTES, so AQE's byte-based coalescing
    # (minPartitionSize 1 MB) collapses the whole stage to one task — a
    # measured 7.3 s single-task stage in a 25 s pipeline at sf0.1. An
    # explicit repartition on the group key is exempt from AQE coalescing
    # and is reused by the cogroup (same hash partitioning), so this costs
    # no extra shuffle; defaultParallelism is the deployment's
    # tasks-per-core sizing.
    par = members.sparkSession.sparkContext.defaultParallelism
    grouped = members.repartition(par, "cluster_id").groupBy("cluster_id").cogroup(
        sims_side.repartition(par, "_cid").groupBy("_cid")
    ).applyInPandas(lambda left, right: run(left, right), REFINE_SCHEMA)
    if passthrough is None:
        return grouped
    return grouped.unionByName(passthrough)


def oversized_refine_stats(labels: DataFrame, max_group_size: int) -> dict:
    """Count clusters/rows skipped by refine_clusters' size guard."""
    row = (
        labels.groupBy("cluster_id").agg(F.count("*").alias("n"))
        .agg(
            F.count("*").alias("clusters"),
            F.sum((F.col("n") > max_group_size).cast("long")).alias("skipped_clusters"),
            F.sum(F.when(F.col("n") > max_group_size, F.col("n")).otherwise(0)).alias(
                "skipped_rows"
            ),
        )
        .collect()[0]
    )
    return {k: int(row[k] or 0) for k in ("clusters", "skipped_clusters", "skipped_rows")}
