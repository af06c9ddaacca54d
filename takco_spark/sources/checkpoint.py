"""Stage checkpointing with resume-skip and per-partition lineage metrics.

Reference analog: takco's step cache — each pipeline step dumps its output to
a workdir directory and is SKIPPED on re-run if that directory exists
(/root/reference/takco/__init__.py:642-694), plus per-stage artifacts like the
tablesim parquet cache (/root/reference/takco/__init__.py:300-376) and the
logged block statistics (/root/reference/takco/cluster/cluster.py:385-390).

Spark-native version: each stage is written as an Iceberg table when an
Iceberg catalog is configured, else as a parquet directory (the sandbox path).
Alongside the data we record one lineage row per (run, stage, partition):
``(run_id, stage, partition_id, rows, wall_ms, skipped, extra)`` appended to
``<base>/_lineage.jsonl``. On re-run, a stage whose `_SUCCESS` marker exists is
read back instead of recomputed — mid-pipeline resume.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        cls = "org.apache.iceberg.spark.SparkCatalog"
        spark.sparkContext._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


class CheckpointManager:
    """Write-once stage store under ``base_dir`` with lineage metrics."""

    def __init__(self, spark: SparkSession, base_dir: str, run_id: str = "run0",
                 config_token: str | None = None):
        """``config_token`` (e.g. a hash of the pipeline config) becomes part
        of every stage path, so re-running with a CHANGED config against the
        same checkpoint_dir recomputes instead of silently serving stale
        artifacts from the previous configuration."""
        self.spark = spark
        self.base_dir = base_dir
        self.run_id = run_id
        self.config_token = config_token
        os.makedirs(base_dir, exist_ok=True)
        self.use_iceberg = _iceberg_available(spark) and bool(
            spark.conf.get("spark.sql.catalog.takco", None)
        )
        self._lineage_path = os.path.join(base_dir, "_lineage.jsonl")

    # -- paths --------------------------------------------------------------
    def stage_path(self, name: str) -> str:
        dirname = f"{name}-{self.config_token}" if self.config_token else name
        return os.path.join(self.base_dir, dirname)

    def exists(self, name: str) -> bool:
        p = self.stage_path(name)
        return os.path.exists(os.path.join(p, "_SUCCESS"))

    # -- lineage ------------------------------------------------------------
    def _append_lineage(self, rows: list[dict]) -> None:
        with open(self._lineage_path, "a", encoding="utf-8") as f:
            for r in rows:
                f.write(json.dumps(r, sort_keys=True) + "\n")

    def lineage(self) -> list[dict]:
        if not os.path.exists(self._lineage_path):
            return []
        with open(self._lineage_path, encoding="utf-8") as f:
            return [json.loads(line) for line in f if line.strip()]

    def _partition_metrics(self, name: str, wall_ms: int, skipped: bool,
                           extra: dict | None) -> None:
        """One lineage row per file partition of the written stage (cheap: a
        count over parquet footers grouped by input file)."""
        df = self._read_stage(name)
        per_part = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .collect()
        )
        ts = time.time()
        rows = [
            {
                "run_id": self.run_id,
                "stage": name,
                "partition_id": int(r["partition_id"]),
                "rows": int(r["rows"]),
                "wall_ms": int(wall_ms),
                "skipped": bool(skipped),
                "ts": ts,
                "extra": extra or {},
            }
            for r in per_part
        ]
        if not rows:  # empty stage still leaves a lineage trace
            rows = [{
                "run_id": self.run_id, "stage": name, "partition_id": -1,
                "rows": 0, "wall_ms": int(wall_ms), "skipped": bool(skipped),
                "ts": ts, "extra": extra or {},
            }]
        self._append_lineage(rows)

    # -- the stage combinator -------------------------------------------------
    def stage(
        self,
        name: str,
        compute: Callable[[], DataFrame],
        extra_metrics: dict | None = None,
        repartition_by: list[str] | None = None,
    ) -> DataFrame:
        """Run-or-resume one stage.

        If the stage artifact exists, read it back (resume path — the compute
        closure is never invoked). Otherwise run ``compute()``, persist it,
        and append per-partition lineage rows.
        """
        path = self.stage_path(name)
        if self.exists(name):
            self._partition_metrics(name, wall_ms=0, skipped=True,
                                    extra=extra_metrics)
            return self._read_stage(name)
        t0 = time.time()
        df = compute()
        writer = df
        if repartition_by:
            writer = df.repartition(*repartition_by)
        self._write_stage(writer, name)
        wall_ms = int((time.time() - t0) * 1000)
        self._partition_metrics(name, wall_ms=wall_ms, skipped=False,
                                extra=extra_metrics)
        return self._read_stage(name)

    # -- storage dispatch -----------------------------------------------------
    def _table_ident(self, name: str) -> str:
        tok = f"_{self.config_token}" if self.config_token else ""
        return f"takco.stages.{name}{tok}"

    def _write_stage(self, df: DataFrame, name: str) -> None:
        """Iceberg ``writeTo`` when the catalog probe succeeded (a cluster
        with iceberg-spark-runtime and ``spark.sql.catalog.takco``
        configured — snapshots give time-travel over stage artifacts), else
        the parquet directory fallback. This sandbox has NO Iceberg runtime
        jar (documented downgrade, TESTDATA.md): ``use_iceberg`` is always
        False here and the fallback path is the one under test; the Iceberg
        branch is exercised only by the probe test pinning the dispatch."""
        if self.use_iceberg:
            self.spark.sql(
                "CREATE NAMESPACE IF NOT EXISTS takco.stages"
            )
            df.writeTo(self._table_ident(name)).createOrReplace()
            # the _SUCCESS convention still drives exists(): mirror a marker
            os.makedirs(self.stage_path(name), exist_ok=True)
            open(os.path.join(self.stage_path(name), "_SUCCESS"), "w").close()
        else:
            df.write.mode("overwrite").parquet(self.stage_path(name))

    def _read_stage(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(self._table_ident(name))
        return self.spark.read.parquet(self.stage_path(name))


class NullCheckpointManager:
    """No-op stand-in when checkpointing is disabled: runs the closure."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def exists(self, name: str) -> bool:
        return False

    def stage(self, name, compute, extra_metrics=None, repartition_by=None):
        return compute()

    def lineage(self) -> list[dict]:
        return []
