"""Pairwise scoring: candidate pairs → multi-matcher similarity columns.

Reference shape: within each blocked candidate pair, every matcher computes a
vectorized similarity and the scores land in one frame keyed by the pair
(make_blocked_matches_df, /root/reference/takco/cluster/cluster.py:186-211);
matchers are token-set Jaccard (celljacc.py:107-121), MinHash digest-mean
(lsh.py:228-247), embedding cosine (embedding.py:227-246).

Spark shape: two hash joins attach per-doc features to the pair stream, then
ALL similarity columns are computed in one projection —
- jaccard:  JVM array_intersect/array_union (celljacc semantics),
- lev_sim:  JVM built-in levenshtein, normalized (types.py:195-201),
- jw:       Arrow-batched numpy Jaro-Winkler (functions.similarity),
- tfidf_cos (optional): sparse sum-product join on shared tokens — the
  canonical Spark TF-IDF cosine (reference analog: snow_pipeline.py:254-313).

The aggregate score is a compiled Column from the config's agg expression
(functions.aggexpr) — same DSL as the reference's numexpr strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from takco_spark.config import PipelineConfig
from takco_spark.functions.aggexpr import compile_agg_expr
from takco_spark.functions.similarity import jaro_winkler_udf
from takco_spark.functions.text import jaccard_tokens, levenshtein_sim

SCORE_COLUMNS = ("jaccard", "lev_sim", "jw", "tfidf_cos")


def tfidf_weights(features: DataFrame) -> DataFrame:
    """(doc_id, tokens) → (doc_id, token, w) with L2-normalized tf-idf.

    tf = 1 per distinct token (tokens are per-doc distinct upstream);
    idf = ln((N+1)/(df+1)) + 1 (smooth); weights L2-normalized per doc so the
    pair dot product IS the cosine.
    """
    n_docs = features.count()
    tok = features.select("doc_id", F.explode("tokens").alias("token"))
    df_counts = tok.groupBy("token").agg(F.count("*").alias("df"))
    weighted = tok.join(df_counts, "token").select(
        "doc_id",
        "token",
        (F.log((F.lit(float(n_docs) + 1.0)) / (F.col("df") + 1.0)) + 1.0).alias("w"),
    )
    norms = weighted.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    return weighted.join(norms, "doc_id").select(
        "doc_id", "token", (F.col("w") / F.col("norm")).alias("w")
    )


def tfidf_cosine_for_pairs(pairs: DataFrame, weights: DataFrame) -> DataFrame:
    """(doc_id_1, doc_id_2) × (doc_id, token, w) → (pair, tfidf_cos).

    Sum-product join over shared tokens only — sparse dot, never a dense
    matrix (SURVEY.md J7).
    """
    w1 = weights.select(
        F.col("doc_id").alias("doc_id_1"), "token", F.col("w").alias("w1")
    )
    w2 = weights.select(
        F.col("doc_id").alias("doc_id_2"), "token", F.col("w").alias("w2")
    )
    return (
        pairs.select("doc_id_1", "doc_id_2")
        .join(w1, "doc_id_1")
        .join(w2, ["doc_id_2", "token"])
        .groupBy("doc_id_1", "doc_id_2")
        .agg(F.sum(F.col("w1") * F.col("w2")).alias("tfidf_cos"))
    )


def score_pairs(
    pairs: DataFrame, features: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """Attach features to pairs, compute all matcher scores + aggregate.

    Returns (doc_id_1, doc_id_2, block_key, jaccard, lev_sim, jw,
    [tfidf_cos,] agg_sim), filtered to agg_sim >= cfg.agg_threshold.
    """
    f1 = features.select(
        F.col("doc_id").alias("doc_id_1"),
        F.col("name").alias("name_1"),
        F.col("tokens").alias("tokens_1"),
    )
    f2 = features.select(
        F.col("doc_id").alias("doc_id_2"),
        F.col("name").alias("name_2"),
        F.col("tokens").alias("tokens_2"),
    )
    # Pin UDF parallelism on the NARROW pair stream, before the feature joins
    # widen each row with two token arrays — repartitioning after the join
    # would shuffle ~KBs per row for no reason, and AQE would otherwise
    # coalesce this small-by-bytes but CPU-heavy stage onto too few
    # partitions. The feature joins are HINTED shuffle-hash: at corpus scale
    # the feature table can never broadcast, and even at mid scale the
    # broadcast build is a serial driver-side cost (measured ~25s flat
    # regardless of cores at 10^5 docs) — SHJ keyed on doc_id scales with
    # the cluster instead.
    parallelism = pairs.sparkSession.sparkContext.defaultParallelism
    joined = (
        pairs.repartition(2 * parallelism, "doc_id_1")
        .join(f1.hint("shuffle_hash"), "doc_id_1")
        .join(f2.hint("shuffle_hash"), "doc_id_2")
    )

    scored = joined.select(
        "doc_id_1",
        "doc_id_2",
        "block_key",
        jaccard_tokens(F.col("tokens_1"), F.col("tokens_2")).alias("jaccard"),
        levenshtein_sim(
            F.col("name_1"), F.col("name_2"), cfg.lev_max_dist_frac
        ).alias("lev_sim"),
        jaro_winkler_udf(F.col("name_1"), F.col("name_2")).alias("jw"),
    )

    available = {"jaccard", "lev_sim", "jw"}
    if cfg.use_tfidf:
        weights = tfidf_weights(features)
        cos = tfidf_cosine_for_pairs(pairs, weights)
        scored = scored.join(cos, ["doc_id_1", "doc_id_2"], "left").withColumn(
            "tfidf_cos", F.coalesce(F.col("tfidf_cos"), F.lit(0.0))
        )
        available.add("tfidf_cos")

    agg = compile_agg_expr(cfg.agg_expr, available)
    return scored.withColumn("agg_sim", agg).where(
        F.col("agg_sim") >= F.lit(cfg.agg_threshold)
    )
