#!/usr/bin/env python
"""Generate golden-pinned expected outputs for the rows-only driver queries.

The seven queries with no SQL-expressible oracle (seeded MinHash/SimHash/
hyperplane hashes, full ER pipelines) get committed expected-output parquet
fixtures instead, so the driver's correctness gate can hash-compare against
a pinned result rather than reporting ``no_oracle`` — drift in any seeded
kernel or pipeline stage becomes visible (r4 verdict task #4). The matching
``oracle_sql()`` entries are plain ``read_parquet`` selects over these files.

SF handling: every query gets one golden per SF (the sf0.001 and sf0.01
document tables share row counts but zero content), selected in SQL by the
orders row count (1500 at sf0.001 vs 15000 at sf0.01) — the driver gate runs
at sf0.01, the pytest harness at sf0.001.

Every golden is generated twice in independent jobs and asserted equal
before being written — a query that is not run-to-run deterministic cannot
be pinned and fails loudly here instead of flaking in the driver.

Regenerate (only) when an algorithm changes intentionally:
    python scripts/make_goldens.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_DIR = os.path.join(REPO, "tests", "data", "goldens")

PER_SF = [
    "minhash_lsh_pairs",
    "simhash_pairs",
    "knn_lsh",
    "knn_ivf",
    "emb_neardup_lsh",
    "emb_neardup_ivf",
    "er_pipeline_spans",
    "er_pipeline_louvain",
    "er_pipeline_aligned",
    "er_pipeline_aligned_max1",
]

SF_DIRS = {"0.001": "/root/testdata/sf0.001", "0.01": "/root/testdata/sf0.01"}


def _canon(pdf):
    """Order-insensitive canonical form (mirrors the driver compare: columns
    sorted by name, floats rounded to 6dp, rows sorted)."""
    cols = sorted(pdf.columns)
    rows = []
    for r in pdf[cols].itertuples(index=False):
        rows.append(tuple(
            round(v, 6) if isinstance(v, float) else v for v in r))
    return cols, sorted(rows)


def _run(spark, qs, name, sf_dir):
    return qs[name](spark, sf_dir).toPandas()


def main() -> None:
    import pandas as pd  # noqa: F401 (toPandas)

    import __spark_entry__ as entrymod
    from takco_spark.session import get_spark

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    spark = get_spark(app_name="make-goldens", master="local[16]")
    qs = entrymod.queries()

    def pin(name: str, sf: str, fname: str) -> None:
        a = _run(spark, qs, name, SF_DIRS[sf])
        b = _run(spark, qs, name, SF_DIRS[sf])
        assert _canon(a) == _canon(b), f"{name}@sf{sf} is not deterministic"
        out = os.path.join(GOLDEN_DIR, fname)
        a.to_parquet(out, index=False)
        print(f"pinned {name}@sf{sf}: {len(a)} rows -> {fname}")

    # optional CLI filter: regenerate only the named queries
    names = [n for n in sys.argv[1:] if n in PER_SF] or PER_SF
    for name in names:
        for sf in ("0.001", "0.01"):
            pin(name, sf, f"{name}.sf{sf}.parquet")

    spark.stop()


if __name__ == "__main__":
    main()
