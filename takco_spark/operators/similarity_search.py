"""Similarity search over an embedding column (array<float>).

Two paths (SURVEY.md J3; reference analog: FAISS inner-product top-100
blocking, /root/reference/takco/cluster/matchers/embedding.py:180-220):

- :func:`knn_brute_force` — exact cosine top-k via a (queries × corpus) join.
  Correct baseline; at scale use it only with a bounded query set (broadcast
  the queries, never the corpus).
- :func:`knn_lsh` — random-hyperplane LSH buckets (sign bits of h random
  projections → bucket key), candidates share a bucket; exact re-rank inside.
  The scale path: the corpus-side shuffle is by bucket, candidate sets are
  bounded, and multiple hash tables trade recall for cost.
- :func:`knn_ivf` — inverted-file index (the FAISS IVF-Flat layout): a
  spherical k-means coarse quantizer trained on a bounded seeded sample,
  corpus vectors assigned to their nearest centroid list, queries probe the
  ``nprobe`` nearest lists; exact cosine re-rank inside the probed lists.
  Data-adaptive where hyperplane LSH is data-oblivious: on clustered
  corpora IVF reaches the same recall scanning far fewer candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from takco_spark.functions.similarity import cosine


def knn_brute_force(queries: DataFrame, corpus: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, cos_sim, rank); excludes self-matches.
    The query side is broadcast — the corpus is never replicated.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def make_hyperplane_udf(dim: int | None, n_bits: int, seed: int):
    """pandas UDF: embedding → LSH bucket keys (one per hash table).

    Random hyperplanes are a pure function of (seed, table, dim); sign bits
    pack into a long per table. Batch-vectorized: one matmul per Arrow batch.

    ``dim=None`` derives the dimensionality from the first non-null vector of
    each executor's first batch — deterministic across executors (the planes
    depend only on (seed, n_bits, dim), and every vector in a column shares
    one dim), so no driver-side ``.first()`` action is needed in the plan.
    """
    n_tables = 4
    state: dict = {}

    def planes_for(d: int):
        if state.get("dim") != d:
            rng = np.random.RandomState(seed)
            state["planes"] = rng.normal(
                size=(n_tables, n_bits, d)).astype(np.float64)
            state["dim"] = d
        return state["planes"]

    if dim is not None:
        planes_for(dim)

    @pandas_udf(ArrayType(LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        d = state.get("dim")
        if d is None:
            d = next((len(v) for v in vecs if v is not None), None)
            if d is None:  # all-null batch before any dim is known
                return pd.Series([None] * len(vecs))
        planes = planes_for(d)
        # null vectors ALWAYS get null buckets (→ dropped by the explode):
        # an absent embedding has no position in the space, and hashing it
        # as a zero vector would make null handling depend on whether dim
        # was already known when the batch arrived (batch-order dependent).
        out: list = [None] * len(vecs)
        mat = np.array(
            [np.zeros(d) if v is None else np.asarray(v, dtype=np.float64) for v in vecs]
        )
        weights = (1 << np.arange(n_bits, dtype=np.int64))
        keys_per_table = []
        for t in range(n_tables):
            proj = mat @ planes[t].T  # (batch, n_bits)
            bits = (proj > 0).astype(np.int64)
            keys_per_table.append((bits * weights).sum(axis=1) + (t << n_bits))
        for i, v in enumerate(vecs):
            if v is not None:
                out[i] = [int(keys_per_table[t][i]) for t in range(n_tables)]
        return pd.Series(out)

    return buckets


def knn_lsh(queries: DataFrame, corpus: DataFrame, k: int = 5, n_bits: int = 8,
            seed: int = 42, id_col: str = "vec_id",
            vec_col: str = "embedding", dim: int | None = None) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane buckets → candidates →
    exact re-rank. Recall < 1 by design; raise tables/lower bits to trade.

    ``dim``: vector dimensionality. Pass it when known (schema metadata /
    config); None derives it in-plan inside the bucket UDF (no driver
    action)."""
    udf = make_hyperplane_udf(dim, n_bits, seed)

    def bucketed(df, idname):
        return df.select(
            F.col(id_col).alias(idname),
            F.col(vec_col).cast("array<double>").alias(f"{idname}_v"),
            F.explode(udf(F.col(vec_col))).alias("bucket"),
        )

    qb = bucketed(queries, "query_id")
    cb = bucketed(corpus, "neighbor_id")
    cands = (
        qb.join(cb, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "query_id_v", "neighbor_id_v")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("query_id_v"), F.col("neighbor_id_v")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def train_ivf_centroids(corpus: DataFrame, n_list: int = 16,
                        sample_cap: int = 20000, seed: int = 42,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        n_iter: int = 20) -> np.ndarray:
    """Spherical k-means coarse quantizer for :func:`knn_ivf`.

    Trains on a BOUNDED deterministic sample — ``orderBy(xxhash64(id))
    .limit(sample_cap)`` is a seeded pseudo-random top-k (one bounded
    shuffle, never a full collect); quantizer training on a sample rather
    than the corpus is the standard IVF protocol (what FAISS's
    ``train()`` does), so the driver-side numpy step stays O(sample × dim)
    regardless of corpus size. Reference analog: the FAISS index build in
    /root/reference/takco/cluster/matchers/embedding.py:180-220.

    Deterministic: seeded init (distinct sample rows), fixed iteration
    count, empty lists re-seeded to the current farthest point. Returns an
    L2-normalized ``(n_list, dim)`` array (inner product == cosine).
    """
    sample = (
        corpus.where(F.col(vec_col).isNotNull())
        .select(F.col(vec_col).cast("array<double>").alias("v"),
                F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("h"))
        .orderBy("h")
        .limit(sample_cap)
        .toPandas()
    )
    mat = np.array([np.asarray(v, dtype=np.float64) for v in sample["v"]])
    if mat.shape[0] == 0:
        raise ValueError("train_ivf_centroids: corpus has no non-null vectors")
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    k = min(n_list, mat.shape[0])
    rng = np.random.RandomState(seed)
    cent = mat[rng.choice(mat.shape[0], size=k, replace=False)].copy()
    for _ in range(n_iter):
        sims = mat @ cent.T                     # (n, k)
        assign = np.argmax(sims, axis=1)
        for j in range(k):
            members = mat[assign == j]
            if len(members) == 0:
                # deterministic re-seed: the point worst-served overall
                cent[j] = mat[np.argmin(np.max(sims, axis=1))]
            else:
                c = members.sum(axis=0)
                n = np.linalg.norm(c)
                cent[j] = c / n if n > 0 else cent[j]
    return cent


def make_ivf_assign_udf(centroids: np.ndarray, nprobe: int = 1):
    """pandas UDF: embedding → the ``nprobe`` nearest centroid list ids.

    Centroids ride the UDF closure (n_list × dim floats — broadcast-sized
    by construction). One normalize + matmul + argpartition per Arrow
    batch; null vectors get null list ids (dropped by the explode — an
    absent embedding has no position in the space).
    """
    cent = np.asarray(centroids, dtype=np.float64)
    k = min(nprobe, cent.shape[0])

    @pandas_udf(ArrayType(LongType()))
    def assign(vecs: pd.Series) -> pd.Series:
        out: list = [None] * len(vecs)
        idx = [i for i, v in enumerate(vecs) if v is not None]
        if idx:
            mat = np.array([np.asarray(vecs.iloc[i], dtype=np.float64)
                            for i in idx])
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (mat / norms) @ cent.T
            top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
            for row, i in enumerate(idx):
                order = top[row][np.argsort(-sims[row, top[row]])]
                out[i] = [int(j) for j in order]
        return pd.Series(out)

    return assign


def knn_ivf(queries: DataFrame, corpus: DataFrame, k: int = 5,
            n_list: int = 16, nprobe: int = 2, seed: int = 42,
            id_col: str = "vec_id", vec_col: str = "embedding",
            sample_cap: int = 20000,
            centroids: np.ndarray | None = None) -> DataFrame:
    """Approximate cosine top-k via an inverted-file index (IVF-Flat).

    Corpus vectors shuffle ONCE on their nearest-centroid list id; each
    query probes its ``nprobe`` nearest lists, so the candidate join fans
    out to ~``nprobe/n_list`` of the corpus per query instead of all of it.
    Exact cosine re-rank inside the probed lists. Recall < 1 by design
    (a true neighbor can live in an unprobed list); raise ``nprobe`` to
    trade cost for recall. Pass precomputed ``centroids`` to reuse a
    trained quantizer across calls (e.g. incremental batches).
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_list=n_list, sample_cap=sample_cap, seed=seed,
            id_col=id_col, vec_col=vec_col)
    c_assign = make_ivf_assign_udf(centroids, nprobe=1)
    q_assign = make_ivf_assign_udf(centroids, nprobe=nprobe)

    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        F.explode(c_assign(F.col(vec_col))).alias("list_id"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.explode(q_assign(F.col(vec_col))).alias("list_id"),
    )
    scored = (
        qb.join(cb, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("qv"), F.col("cv")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
