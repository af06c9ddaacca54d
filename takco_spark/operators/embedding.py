"""F11: mean-of-span-embedding features + the embedding matcher/blocker.

Reference semantics (EmbeddingMatcher,
/root/reference/takco/cluster/matchers/embedding.py):
- a cell's vector is the SUM of its tokens' word vectors (get_vec, :88-101);
- a column's vector is the MEAN of its cell vectors (:99-101);
- blocking = top-n positive-cosine neighbors over the normalized means
  (FAISS IndexFlatIP, :180-220) — here random-hyperplane LSH buckets, the
  shuffle-native equivalent (shared kernel with operators.similarity_search);
- matching = positive cosine per candidate pair (vecsim, :227-246).

Word vectors come from any ``(token, vec)`` DataFrame (a broadcast-joined
word-vec map). The sandbox has no pretrained vectors, so
:func:`hash_word_vec_expr` provides a deterministic hash-projection stand-in
(a real word2vec/fastText table slots into the same join) — the Spark-side
plumbing (schemas, joins, aggregation shape) is identical either way.

Everything is JVM Column algebra over the long (doc, span, dim) format — no
Python in the vector-aggregation path; only the hyperplane bucketing UDF is
an Arrow-batched matmul.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from takco_spark.spans import explode_spans


def hash_word_vec_expr(token_col, pos_col, seed: int):
    """Deterministic pseudo word-vector component in [-1, 1]: a pure JVM
    function of (token, dimension, seed). Documented stand-in for a real
    word-vector table — same distributional role (similar tokens do NOT get
    similar vectors; identical tokens do, which is what the mean-of-span
    aggregation and cosine matcher need for exact-token overlap signal)."""
    h = F.xxhash64(token_col, pos_col, F.lit(int(seed)))
    return (F.pmod(h, F.lit(2_000_001)) - F.lit(1_000_000)) / F.lit(1_000_000.0)


def doc_mean_embeddings(
    documents: DataFrame,
    dim: int = 16,
    seed: int = 42,
    word_vecs: DataFrame | None = None,
    min_token_len: int = 2,
) -> DataFrame:
    """(doc_id, spans) → (doc_id, emb: array<double>): per span, SUM the
    word vectors of its tokens; per document, MEAN the span vectors
    (reference get_vec arithmetic, embedding.py:88-101).

    ``word_vecs``: optional (token, vec array<double>) table, broadcast into
    the token stream; None uses the deterministic hash projection.

    Shape: long-format (doc_id, offset, pos, val) aggregation — two groupBys
    partitioned by doc_id (dims per doc are bounded: dim × spans), then one
    collect_list assembly. Scales linearly in corpus size; no driver data.
    """
    toks = (
        explode_spans(documents)
        .where(F.col("kind") != "media")
        .select(
            "doc_id",
            "offset",
            F.explode(
                F.filter(
                    F.split(F.lower("text"), r"\W+"),
                    lambda t: F.length(t) >= F.lit(min_token_len),
                )
            ).alias("token"),
        )
    )
    if word_vecs is not None:
        long = toks.join(F.broadcast(word_vecs), "token").select(
            "doc_id", "offset", F.posexplode("vec").alias("pos", "val")
        )
    else:
        long = toks.select(
            "doc_id",
            "offset",
            "token",
            F.explode(F.sequence(F.lit(0), F.lit(int(dim) - 1))).alias("pos"),
        ).select(
            "doc_id",
            "offset",
            "pos",
            hash_word_vec_expr(F.col("token"), F.col("pos"), seed).alias("val"),
        )
    span_sums = long.groupBy("doc_id", "offset", "pos").agg(
        F.sum("val").alias("sv")
    )
    doc_means = span_sums.groupBy("doc_id", "pos").agg(F.avg("sv").alias("mv"))
    return doc_means.groupBy("doc_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, mv))), x -> x.mv)"
        ).alias("emb")
    )


def embedding_blocks(embeddings: DataFrame, dim: int, n_bits: int = 12,
                     seed: int = 42) -> DataFrame:
    """(doc_id, emb) → (block_key='emb<t>:<bucket>', doc_id): random-
    hyperplane LSH buckets as a THIRD blocker (the distributed analog of the
    reference's FAISS top-n blocking, embedding.py:180-220). Same key-stream
    contract as token_blocks/minhash_blocks, so the union cap/salt pass and
    the pair self-join apply unchanged."""
    from takco_spark.operators.similarity_search import make_hyperplane_udf

    udf = make_hyperplane_udf(dim, n_bits, seed)
    return embeddings.select(
        "doc_id", F.explode(udf(F.col("emb"))).alias("bucket")
    ).select(
        F.concat(F.lit("emb:"), F.col("bucket").cast("string")).alias("block_key"),
        "doc_id",
    )
