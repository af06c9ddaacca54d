"""KB-integration aggregates: n-ary property election (A13) + salience (A15).

Reference semantics distilled to their data-parallel core:

- A13 (NaryIntegrator.integrate,
  /root/reference/takco/link/integrate.py:33-75): count row-level property
  matches per (from_col, to_col, property); a column pair's property score is
  ``count / n_rows``; each to_col elects ONE best (from_col, property).
  The reference's Counter loops become one groupBy + one window top-1.

- A15 (property/class salience, /root/reference/takco/link/linkers.py:270-313
  and :388-406): candidate count per (col, item) normalized by the item's
  GLOBAL frequency — ``salience = n / (global_count + 1)`` — kept only when
  coverage ``n >= n_total · cover``; each col elects its most salient item.

Both are pure DataFrame algebra (two shuffles each: one count groupBy, one
window partitioned by the elect-key); at 100 TB the fact streams shuffle on
their group keys and nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def nary_property_agg(matches: DataFrame, n_rows: int | DataFrame) -> DataFrame:
    """matches(from_col, to_col, prop) — one row per row-level match — →
    per to_col the elected (from_col, prop) with score = count / n_rows.

    Ties break deterministically by (count desc, from_col, prop) — the
    reference iterates sorted Counters, so its election is order-stable too.

    ``n_rows`` may be a plain int, or a 1-row/1-column DataFrame (e.g.
    ``facts.agg(F.count("*"))``) that stays INSIDE the plan as a broadcast
    cross join — no separate driver-side count job (same pattern as
    tfidf_weights' in-plan N).
    """
    counts = matches.groupBy("to_col", "from_col", "prop").agg(
        F.count("*").alias("n")
    )
    if isinstance(n_rows, DataFrame):
        denom = n_rows.select(
            F.col(n_rows.columns[0]).cast("double").alias("_n_rows")
        )
        counts = counts.crossJoin(F.broadcast(denom))
        score = F.col("n") / F.col("_n_rows")
    else:
        score = F.col("n") / F.lit(float(n_rows))
    w = Window.partitionBy("to_col").orderBy(
        F.desc("n"), F.asc("from_col"), F.asc("prop")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("to_col", "from_col", "prop", score.alias("score"))
    )


def salience_counts(
    candidates: DataFrame,
    global_counts: DataFrame,
    cover: float = 0.0,
    n_total: int | None = None,
) -> DataFrame:
    """candidates(col, item) + global_counts(item, total) → per (col, item)
    ``salience = n / (total + 1)`` with the coverage floor, plus the top-1
    election per col (rank column rk).

    ``n_total`` defaults to the candidate row count per col when None is
    passed — matching the reference's per-column ntotal.
    """
    counts = candidates.groupBy("col", "item").agg(F.count("*").alias("n"))
    if n_total is None:
        totals = candidates.groupBy("col").agg(F.count("*").alias("ntot"))
        counts = counts.join(totals, "col")
    else:
        counts = counts.withColumn("ntot", F.lit(int(n_total)))
    scored = (
        counts.join(F.broadcast(global_counts), "item")
        .where(F.col("n") >= F.col("ntot") * F.lit(float(cover)))
        .select(
            "col",
            "item",
            "n",
            (F.col("n") / (F.col("total") + 1)).alias("salience"),
        )
    )
    w = Window.partitionBy("col").orderBy(F.desc("salience"), F.asc("item"))
    return scored.withColumn("rk", F.row_number().over(w))
