"""Cluster-quality metrics: pairwise precision / recall / F1.

Reference analog: predictions are outer-joined with gold and scored with
precision/recall/F1 (/root/reference/takco/evaluate/score.py:8-30, driven by
TableSet.score, /root/reference/takco/__init__.py:503-543). Our unit of
evaluation is the PAIR (BASELINE.json metric: "pairwise F1 on labeled pairs").

Two evaluators:
- :func:`pairwise_f1` — against full gold cluster assignments, computed from
  cluster-size combinatorics (Σ C(n,2)) so it never materializes O(n²) pairs;
- :func:`labeled_pairs_f1` — against an explicit labeled-pair table
  (doc_id_1, doc_id_2, is_match), join-based.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PRF1:
    tp: float
    fp: float
    fn: float

    @property
    def precision(self) -> float:
        return self.tp / (self.tp + self.fp) if (self.tp + self.fp) else 1.0

    @property
    def recall(self) -> float:
        return self.tp / (self.tp + self.fn) if (self.tp + self.fn) else 1.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0

    def as_dict(self) -> dict:
        return {"tp": self.tp, "fp": self.fp, "fn": self.fn,
                "precision": self.precision, "recall": self.recall,
                "f1": self.f1}


def _pair_count(df: DataFrame, col: str) -> float:
    """Σ C(n_c, 2) over groups of ``col`` — number of intra-cluster pairs."""
    row = (
        df.groupBy(col)
        .agg(F.count("*").alias("n"))
        .agg(F.coalesce(F.sum(F.col("n") * (F.col("n") - 1) / 2), F.lit(0.0)).alias("p"))
        .collect()[0]
    )
    return float(row["p"])


def pairwise_f1(pred: DataFrame, gold: DataFrame) -> PRF1:
    """pred(doc_id, cluster_id) vs gold(doc_id, true_entity) → pairwise PRF1.

    tp = Σ C(n,2) over the (cluster_id, true_entity) joint contingency table;
    fp = pred_pairs − tp; fn = gold_pairs − tp. No pair materialization —
    scales to arbitrarily many docs (three aggregations).
    """
    joined = pred.select("doc_id", "cluster_id").join(
        gold.select("doc_id", "true_entity"), "doc_id"
    )
    pred_pairs = _pair_count(joined, "cluster_id")
    gold_pairs = _pair_count(joined, "true_entity")
    both = (
        joined.groupBy("cluster_id", "true_entity")
        .agg(F.count("*").alias("n"))
        .agg(F.coalesce(F.sum(F.col("n") * (F.col("n") - 1) / 2), F.lit(0.0)).alias("p"))
        .collect()[0]
    )
    tp = float(both["p"])
    return PRF1(tp=tp, fp=pred_pairs - tp, fn=gold_pairs - tp)


def labeled_pairs_f1(pred: DataFrame, labeled_pairs: DataFrame) -> PRF1:
    """pred(doc_id, cluster_id) vs labeled_pairs(doc_id_1, doc_id_2,
    is_match) → PRF1 over exactly the labeled pairs (the BASELINE.json
    "labeled pairs at shared blocking key" protocol)."""
    p1 = pred.select(F.col("doc_id").alias("doc_id_1"), F.col("cluster_id").alias("c1"))
    p2 = pred.select(F.col("doc_id").alias("doc_id_2"), F.col("cluster_id").alias("c2"))
    j = labeled_pairs.join(p1, "doc_id_1").join(p2, "doc_id_2")
    agg = j.agg(
        F.sum(((F.col("c1") == F.col("c2")) & F.col("is_match")).cast("long")).alias("tp"),
        F.sum(((F.col("c1") == F.col("c2")) & ~F.col("is_match")).cast("long")).alias("fp"),
        F.sum(((F.col("c1") != F.col("c2")) & F.col("is_match")).cast("long")).alias("fn"),
    ).collect()[0]
    return PRF1(tp=float(agg["tp"] or 0), fp=float(agg["fp"] or 0), fn=float(agg["fn"] or 0))


def pr_curve(scored: DataFrame, score_col: str = "score",
             label_col: str = "is_match", digits: int = 6) -> DataFrame:
    """Precision/recall at every distinct score threshold — the reference's
    PR-curve evaluation (sklearn precision_recall_curve semantics,
    /root/reference/takco/evaluate/score.py:32-47): predictions with
    score >= t count positive at threshold t.

    Scale shape: the pair stream is AGGREGATED per rounded score first (one
    shuffle keyed on score); the cumulative window then runs over the small
    distinct-threshold table only (bounded by 10^digits, never by pair
    count) — a global-order window over the raw pairs would serialize.

    Returns (threshold, tp, fp, fn, precision, recall) sorted desc.
    """
    from pyspark.sql import Window

    sc = F.round(F.col(score_col), digits).alias("threshold")
    lab = F.col(label_col).cast("int")
    per = scored.select(sc, lab.alias("pos")).groupBy("threshold").agg(
        F.sum("pos").alias("tp_at"), F.count("*").alias("n_at")
    )
    w = Window.orderBy(F.desc("threshold")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    totals = per.agg(F.sum("tp_at").alias("total_pos")).select("total_pos")
    cum = per.select(
        "threshold",
        F.sum("tp_at").over(w).alias("cum_tp"),
        F.sum("n_at").over(w).alias("cum_n"),
    )
    return cum.crossJoin(F.broadcast(totals)).select(
        "threshold",
        F.col("cum_tp").alias("tp"),
        (F.col("cum_n") - F.col("cum_tp")).alias("fp"),
        (F.col("total_pos") - F.col("cum_tp")).alias("fn"),
        (F.col("cum_tp") / F.col("cum_n")).alias("precision"),
        F.when(F.col("total_pos") > 0,
               F.col("cum_tp") / F.col("total_pos")).otherwise(F.lit(1.0)
               ).alias("recall"),
    )


def novelty_counts(kinds: DataFrame, gold: DataFrame, pred: DataFrame) -> DataFrame:
    """A12 — novelty counting by set algebra, join-based.

    Reference (/root/reference/takco/evaluate/novelty.py:61-96): per novelty
    kind with triple-hash set hs, gold set gs, predicted set ps:
    tp = |hs∩gs∩ps|, fn = |hs∩gs−ps|, fp = |hs∩ps−gs|.

    Inputs: kinds(item_id, kind) — kind membership; gold(item_id);
    pred(item_id). Output: (kind, tp, fp, fn) — conditional counts after two
    left-semi-style flags, one aggregation.
    """
    g = gold.select(F.col("item_id").alias("item_id"), F.lit(True).alias("in_gold"))
    p = pred.select(F.col("item_id").alias("item_id"), F.lit(True).alias("in_pred"))
    flagged = (
        kinds.join(g, "item_id", "left")
        .join(p, "item_id", "left")
        .select(
            "kind",
            F.coalesce("in_gold", F.lit(False)).alias("in_gold"),
            F.coalesce("in_pred", F.lit(False)).alias("in_pred"),
        )
    )
    return flagged.groupBy("kind").agg(
        F.sum((F.col("in_gold") & F.col("in_pred")).cast("long")).alias("tp"),
        F.sum((~F.col("in_gold") & F.col("in_pred")).cast("long")).alias("fp"),
        F.sum((F.col("in_gold") & ~F.col("in_pred")).cast("long")).alias("fn"),
    )


def block_stats(blocks: DataFrame) -> dict:
    """Block-size distribution + candidate-pair reduction factor — the
    reference logs worstcase/total as its blocking diagnostic
    (/root/reference/takco/cluster/cluster.py:385-390)."""
    n_docs = blocks.select("doc_id").distinct().count()
    sizes = blocks.groupBy("block_key", "salt").agg(F.count("*").alias("n"))
    agg = sizes.agg(
        F.count("*").alias("keys"),
        F.coalesce(F.sum(F.col("n") * (F.col("n") - 1) / 2), F.lit(0.0)).alias("pairs_bound"),
        F.coalesce(F.max("n"), F.lit(0)).alias("max_block"),
        F.coalesce(F.avg("n"), F.lit(0.0)).alias("avg_block"),
    ).collect()[0]
    worstcase = n_docs * (n_docs - 1) / 2
    pairs_bound = float(agg["pairs_bound"])
    return {
        "n_docs": n_docs,
        "n_keys": int(agg["keys"]),
        "pairs_upper_bound": pairs_bound,
        "max_block": int(agg["max_block"]),
        "avg_block": float(agg["avg_block"]),
        "reduction_factor": (worstcase / pairs_bound) if pairs_bound else float("inf"),
    }
