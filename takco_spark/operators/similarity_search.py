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
