"""Profiling operators: probabilistic functional dependencies, key-column
detection, column typing (SURVEY.md A9/A10/P4/P5).

Reference semantics:
- pFD: P(two tuples sharing X share a) estimated per-tuple as
  Σ_x max_a count(x, a) / Σ_x count(x) — ``perTuple_pFDs``,
  /root/reference/takco/link/profile.py:33-114.
- key column: the column whose incoming pFDs have the highest harmonic mean,
  above 0.9, leftmost wins — ``PFDProfiler.get_keycol``,
  /root/reference/takco/link/profile.py:95-114.
- column typing: cell-class counts with a majority (>50%) vote —
  ``SimpleTyper.coltype``, /root/reference/takco/link/types.py:121-142.

All are two-level groupBy aggregations — pure Catalyst plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from takco_spark.functions.text import YEAR_PATTERN


def pfd(df: DataFrame, determinant: str, dependent: str) -> float:
    """P(determinant → dependent) over the rows of ``df`` (per-tuple pFD)."""
    co = df.groupBy(determinant, dependent).agg(F.count("*").alias("n"))
    per_key = co.groupBy(determinant).agg(
        F.max("n").alias("mx"), F.sum("n").alias("tot")
    )
    row = per_key.agg(
        (F.sum("mx") / F.sum("tot")).alias("p")
    ).collect()[0]
    return float(row["p"]) if row["p"] is not None else 0.0


def pfd_matrix(df: DataFrame, columns: list[str]) -> DataFrame:
    """All pairwise pFDs among ``columns`` → (determinant, dependent, pfd).

    One unpivoted pass per determinant (columns are few); each pFD is the
    same two-level aggregation as :func:`pfd` kept distributed.
    """
    spark = df.sparkSession
    parts = []
    for det in columns:
        for dep in columns:
            if det == dep:
                continue
            co = df.groupBy(det, dep).agg(F.count("*").alias("n"))
            per_key = co.groupBy(det).agg(
                F.max("n").alias("mx"), F.sum("n").alias("tot")
            )
            parts.append(
                per_key.agg(
                    F.lit(det).alias("determinant"),
                    F.lit(dep).alias("dependent"),
                    (F.sum("mx") / F.sum("tot")).alias("pfd"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def key_column(df: DataFrame, columns: list[str], threshold: float = 0.9) -> str | None:
    """Key column = max harmonic mean of INCOMING pFDs (other → this), above
    threshold; leftmost wins ties (reference get_keycol semantics)."""
    mat = pfd_matrix(df, columns).collect()
    incoming: dict[str, list[float]] = {c: [] for c in columns}
    for r in mat:
        incoming[r["determinant"]].append(float(r["pfd"] or 0.0))
    best, best_h = None, threshold
    for c in columns:  # column order = leftmost priority
        vals = incoming[c]
        if not vals or any(v == 0 for v in vals):
            continue
        h = len(vals) / sum(1.0 / v for v in vals)
        if h > best_h:
            best, best_h = c, h
    return best


def uniqueness(df: DataFrame, columns: list[str]) -> DataFrame:
    """Uniqueness ratio per column (reference key-candidate heuristic:
    ratio > 0.9, leftmost — takco/link/profile.py:18-31)."""
    aggs = []
    for c in columns:
        aggs.append((F.countDistinct(c) / F.count("*")).alias(c))
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{c}', `{c}`" for c in columns)
    return wide.selectExpr(
        f"stack({len(columns)}, {stack}) as (column_name, uniqueness_ratio)"
    )


def _cell_type_expr(c: str) -> str:
    """Cell-class CASE expr — the reference's type hierarchy year → numeric →
    datetime → text (SimpleTyper, takco/link/types.py:121-142)."""
    year = YEAR_PATTERN.replace("\\", "\\\\")
    return (
        f"CASE WHEN {c} IS NULL OR {c} = '' THEN 'empty' "
        f"WHEN {c} rlike '{year}' THEN 'year' "
        f"WHEN regexp_replace(regexp_replace({c}, '−', '-'), '[-.,%\\\\s]', '') rlike '^[0-9]+$' THEN 'numeric' "
        f"WHEN try_to_timestamp({c}) IS NOT NULL THEN 'datetime' "
        f"ELSE 'text' END"
    )


def column_types(cells: DataFrame, group_col: str, value_col: str,
                 majority: float = 0.5) -> DataFrame:
    """Type each group of cells by majority cell-class vote.

    cells(group_col, value_col) → (group_col, col_type, cover). ``col_type``
    is null when no class exceeds the majority threshold — exactly the
    reference's "untyped column" outcome.
    """
    typed = cells.withColumn("cell_type", F.expr(_cell_type_expr(value_col)))
    counts = typed.groupBy(group_col, "cell_type").agg(F.count("*").alias("n"))
    totals = typed.groupBy(group_col).agg(F.count("*").alias("total"))
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.desc("n"), F.asc("cell_type"))
    top = counts.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        top.join(totals, group_col)
        .select(
            group_col,
            F.when(F.col("n") / F.col("total") > majority, F.col("cell_type"))
            .otherwise(F.lit(None))
            .alias("col_type"),
            (F.col("n") / F.col("total")).alias("cover"),
        )
    )
