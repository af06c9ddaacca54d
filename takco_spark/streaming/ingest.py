"""Structured-Streaming document ingestion.

``readStream`` over a landing directory of JSONL documents → normalize into
the canonical span-structured shape → ``writeStream`` (append) into a parquet
bronze table with checkpointed file tracking: restarts resume exactly where
they stopped, never double-ingesting a file — the streaming twin of the batch
stage-checkpoint semantics (sources/checkpoint.py).

At cluster scale the sink would be an Iceberg table (`.toTable(...)`); the
parquet path is the sandbox fallback, same as everywhere else in the engine.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from takco_spark.spans import DOCUMENT_SCHEMA


def ingest_documents_stream(
    spark: SparkSession,
    landing_dir: str,
    bronze_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 64,
    available_now: bool = True,
) -> StreamingQuery:
    """Start (or resume) the ingestion stream.

    ``available_now=True`` processes the current backlog then stops — the
    batch-friendly trigger used in tests and scheduled micro-batch runs;
    ``False`` runs continuously.
    """
    src = (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(landing_dir)
    )
    normalized = src.where(
        F.col("doc_id").isNotNull() & (F.size("spans") >= 0)
    ).withColumn("ingest_batch", F.lit(None).cast("string"))

    writer = (
        normalized.writeStream.format("parquet")
        .option("path", bronze_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
