"""Round-6 optimization measurement harness (bench.py is FROZEN for
measurement — this file carries the guide §1 noop-sink isolation runs and
plan captures that OPTIMIZATION_r06.md cites).

Usage:
    python bench_extra.py time  [query ...]     # noop-sink wall, min of N reps
    python bench_extra.py plan  [query ...]     # .explain("formatted") capture
    python bench_extra.py both  [query ...]
    QUERY default: the bench HEADLINE list.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32), R6_REPS (default 2), R6_TAG (plan file suffix, default none).
Writes plans to plans/r06/<query>_<tag>.txt and prints one JSON line with the
walls.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("R6_REPS", "2"))
TAG = os.environ.get("R6_TAG", "")

HEADLINE = [
    "er_pipeline_spans", "er_pipeline_aligned_max1", "token_blocking",
    "ngram_jaccard_capped", "minhash_lsh_pairs", "simhash_pairs",
    "knn_cosine", "pricing_summary", "window_running_sum", "pfd",
]


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    names = sys.argv[2:] or HEADLINE

    import __spark_entry__ as entrymod
    from takco_spark.session import get_spark

    spark = get_spark(app_name="bench-extra-r6", master=f"local[{CPUS}]")
    spark.range(10**6).count()
    qs = entrymod.queries()
    # pre-build the aligned fixture outside any clock (bench does the same)
    if any(n.startswith("er_pipeline_aligned") for n in names):
        entrymod.aligned_corpus(spark, SF_DIR)

    plans_dir = REPO / "plans" / "r06"
    plans_dir.mkdir(parents=True, exist_ok=True)

    out: dict[str, object] = {"sf_dir": SF_DIR, "cpus": CPUS, "reps": {}}
    for name in names:
        fn = qs[name]
        if mode in ("plan", "both"):
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            suffix = f"_{TAG}" if TAG else ""
            (plans_dir / f"{name}{suffix}.txt").write_text(plan)
        if mode in ("time", "both"):
            spark.sparkContext.setJobDescription(f"r6:{name}:warm")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            cold = round(time.time() - t0, 3)
            reps = []
            for i in range(REPS):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"r6:{name}:rep{i}")
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                reps.append(round(time.time() - t0, 3))
            out["reps"][name] = {"cold": cold, "steady": reps,
                                 "best": min(reps)}
            print(f"# {name}: cold={cold} steady={reps}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
