"""Literal tolerance matchers + reshape helpers (SURVEY.md F4-F6, F19-F20).

Reference arithmetic:
- datetime tolerance: ``1 - |s - l| / year`` accepted > 0.9
  (/root/reference/takco/link/types.py:153-174);
- numeric tolerance: ``1 - |s - l| / max(|s|, |l|)`` accepted > 0.95
  (/root/reference/takco/link/types.py:176-185);
- date parsing fallback chain isoformat → dateutil
  (/root/reference/takco/link/types.py:93-115) → here a to_timestamp format
  chain, JVM-side;
- unpivot: stack header row into rows (PivotFinder.unpivot,
  /root/reference/takco/reshape/findpivot.py:100-158) → native melt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SECONDS_PER_YEAR = 365.0 * 24 * 3600


def parse_datetime(col: Column | str) -> Column:
    """Fallback-chain timestamp parse (strict ISO → date → year).

    Uses ``try_to_timestamp`` for every link so malformed inputs yield null
    (and the coalesce falls through) regardless of the session's
    ``spark.sql.ansi.enabled`` setting — plain ``to_timestamp`` throws under
    ANSI mode instead of returning null.
    """
    c = F.col(col) if isinstance(col, str) else col
    year = F.regexp_extract(c, r"^(\d{4})", 1)
    return F.coalesce(
        F.try_to_timestamp(c),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(c, F.lit("dd/MM/yyyy")),
        F.when(year != "", F.try_to_timestamp(year, F.lit("yyyy"))),
    )


def datetime_tolerance_sim(a: Column, b: Column) -> Column:
    """1 - |a-b| / year, clamped at 0 (reference accept threshold 0.9)."""
    d = F.abs(F.unix_timestamp(a) - F.unix_timestamp(b)) / F.lit(SECONDS_PER_YEAR)
    return F.greatest(F.lit(0.0), F.lit(1.0) - d)


def numeric_tolerance_sim(a: Column, b: Column) -> Column:
    """1 - |a-b| / max(|a|, |b|) (reference accept threshold 0.95);
    equal-zero pairs score 1."""
    m = F.greatest(F.abs(a), F.abs(b))
    return F.when(m > 0, F.lit(1.0) - F.abs(a - b) / m).otherwise(F.lit(1.0))


def unpivot(df: DataFrame, id_cols: list[str], value_cols: list[str],
            var_name: str = "variable", value_name: str = "value") -> DataFrame:
    """F19: melt value columns into rows (native Spark unpivot)."""
    return df.unpivot(id_cols, value_cols, var_name, value_name)


def common_prefix(col: Column | str, other: Column | str) -> Column:
    """F17 helper: length of the common prefix of two strings (compound
    header splitting uses group-wise common prefixes,
    /root/reference/takco/reshape/compound.py:98-125)."""
    a = F.col(col) if isinstance(col, str) else col
    b = F.col(other) if isinstance(other, str) else other
    n = F.least(F.length(a), F.length(b))
    # first position where chars differ; aggregate over positions JVM-side
    return F.aggregate(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        F.lit(0),
        lambda acc, i: F.when(
            (acc == i - 1) & (F.substring(a, 1, i) == F.substring(b, 1, i)), i
        ).otherwise(acc),
    )
