"""Stitching operators: exact-key pre-clustering (header unions), majority
header merge, cluster union (SURVEY.md A7, G5, EP2 step 2).

Reference semantics:
- header-union fold: tables grouped by deterministic headerId and reduced
  with Table.append (/root/reference/takco/__init__.py:282-291,
  /root/reference/takco/cluster/headerunions.py:4-9) — an exact-key
  pre-clustering that shrinks the candidate universe before fuzzy blocking;
- majority header merge: per merged column, the most frequent non-empty
  header cell (/root/reference/takco/cluster/cluster.py:692-700);
- stitch/union: align member rows under the cluster, keep per-source
  provenance (/root/reference/takco/cluster/cluster.py:532-649).

Spark shape: set semantics, not iterative folds — a groupBy IS the union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from takco_spark.functions.text import header_id


def header_union_groups(documents: DataFrame) -> DataFrame:
    """Group documents by the deterministic hash of their header-span text
    (exact-key pre-clustering). Returns (doc_id, header_key) where header_key
    is shared by documents with identical header sequences.

    Documents with no header spans get header_key null (no exact-key group).
    """
    hdr = (
        "array_join(transform(array_sort(filter(spans, s -> s.kind = 'header'),"
        " (a, b) -> case when a.offset < b.offset then -1 when a.offset > b.offset"
        " then 1 else 0 end), s -> s.text), ' ')"
    )
    return documents.select(
        "doc_id",
        F.when(
            F.expr(hdr) != "", header_id(F.expr(hdr))
        ).alias("header_key"),
    )


def header_union_merge(
    documents: DataFrame, max_group: int = 1000
) -> tuple[DataFrame, DataFrame]:
    """Exact-key pre-clustering (EP2 step 2): merge documents with identical
    header-span sequences into one union document each, BEFORE blocking.

    Reference: the headerunions fold — tables grouped by deterministic
    headerId and reduced with Table.append
    (/root/reference/takco/__init__.py:282-291,
    /root/reference/takco/cluster/headerunions.py:4-9). The Spark shape is a
    groupBy, not an iterative fold: member spans concatenate in (doc_id,
    offset) order with offsets renumbered (the analog of Table.append's
    row_offset bookkeeping, table.py:308-338).

    Returns ``(membership, union_docs)``:

    - membership: (doc_id, rep_id) — every input doc mapped to its union
      representative (min member doc_id); headerless docs map to themselves;
    - union_docs: (doc_id, spans) — one row per union/singleton, ready to
      feed the ER pipeline in place of ``documents``. Final cluster labels
      are expanded back to members through ``membership``.

    Scale shape: singleton docs (the common case) pass through without
    touching the explode/renumber path — only members of real groups (>1)
    pay the merge shuffle, partitioned by rep_id. ``max_group`` bounds the
    per-union span list (same role as the G2 cluster guard): larger header
    groups split into sub-unions whose identical features re-link through
    the fuzzy pipeline anyway.
    """
    hu = header_union_groups(documents)
    keyed = hu.where(F.col("header_key").isNotNull())
    # Sub-group assignment is HASH-based, never a row_number window over
    # header_key: at web scale one hot header ("name | value") can have 10^8
    # members, and a global per-key window serializes that key into a single
    # task before the split can help. pmod(xxhash64(doc_id), ceil(n/cap))
    # buckets each member independently (group sizes ~cap in expectation
    # rather than exactly cap — the docstring's re-link argument covers the
    # variance); the count join is one map-side-combined agg.
    counts = keyed.groupBy("header_key").agg(F.count("*").alias("_n"))
    sub = keyed.join(counts, "header_key").withColumn(
        "_sub",
        F.pmod(
            F.xxhash64("doc_id"),
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.col("_n") / F.lit(int(max_group))).cast("long"),
            ),
        ),
    )
    reps = sub.groupBy("header_key", "_sub").agg(F.min("doc_id").alias("rep_id"))
    membership = (
        sub.join(reps, ["header_key", "_sub"])
        .select("doc_id", "rep_id")
        .unionByName(
            hu.where(F.col("header_key").isNull())
            .select("doc_id", F.col("doc_id").alias("rep_id"))
        )
    )
    sizes = membership.groupBy("rep_id").agg(F.count("*").alias("_n"))
    multi = membership.join(sizes.where(F.col("_n") > 1).select("rep_id"),
                            "rep_id")
    singles = documents.join(multi.select("doc_id"), "doc_id", "left_anti")

    long = (
        documents.join(multi, "doc_id")
        .select("rep_id", "doc_id", F.explode("spans").alias("s"))
    )
    w2 = Window.partitionBy("rep_id").orderBy(
        "doc_id", F.col("s.offset"), F.col("s.kind"), F.col("s.text"))
    merged = (
        long.withColumn("_pos", F.row_number().over(w2))
        .groupBy("rep_id")
        .agg(F.array_sort(F.collect_list(F.struct(
            F.col("_pos").alias("pos"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
        ))).alias("xs"))
        .select(
            F.col("rep_id").alias("doc_id"),
            F.expr(
                "transform(xs, x -> struct(x.kind as kind, x.text as text,"
                " x.media_ref as media_ref, cast(x.pos as int) as offset))"
            ).alias("spans"),
        )
    )
    union_docs = singles.select("doc_id", "spans").unionByName(merged)
    return membership, union_docs


def majority_header(cells: DataFrame, group_col: str = "cluster_id",
                    value_col: str = "text") -> DataFrame:
    """Most frequent non-empty value per group, deterministic tie-break
    (count desc, value asc) — the merged cluster's representative header."""
    counts = (
        cells.where(F.col(value_col) != "")
        .groupBy(group_col, value_col)
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("n"), F.asc(value_col))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(group_col, F.col(value_col).alias("header"), F.col("n").alias("support"))
    )


def stitch_clusters(labelled: DataFrame) -> DataFrame:
    """Union each cluster's documents into one stitched record:

    (cluster_id, n_docs, doc_ids, spans) — member doc_ids sorted (provenance),
    spans concatenated in (doc_id, offset) order with offsets re-based so the
    stitched span sequence is itself a valid, strictly-ordered sequence
    (reference concat semantics: row_offset bookkeeping in Table.append,
    /root/reference/takco/table.py:308-338).
    """
    member_spans = labelled.select(
        "cluster_id",
        "doc_id",
        F.expr(
            "array_sort(spans, (a, b) -> case when a.offset < b.offset then -1 "
            "when a.offset > b.offset then 1 else 0 end)"
        ).alias("spans_sorted"),
    )
    grouped = member_spans.groupBy("cluster_id").agg(
        F.count("*").alias("n_docs"),
        F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        F.flatten(
            F.expr(
                "transform(array_sort(collect_list(struct(doc_id, spans_sorted))), x -> x.spans_sorted)"
            )
        ).alias("all_spans"),
    )
    return grouped.select(
        "cluster_id",
        "n_docs",
        "doc_ids",
        F.expr(
            "transform(all_spans, (s, i) -> struct(s.kind as kind, s.text as text,"
            " s.media_ref as media_ref, cast(i as int) as offset))"
        ).alias("spans"),
    )
