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


def dedup_documents_stream(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Custom STATEFUL streaming operator: exact dedup across micro-batches.

    Keyed on the md5 fingerprint of the document's normalized span text, an
    ``applyInPandasWithState`` group keeps one bit of state per fingerprint
    ("already emitted") so each distinct document surfaces EXACTLY ONCE over
    the stream's whole lifetime — including across restarts (state lives in
    the streaming checkpoint; on a cluster, the RocksDB state store). The
    streaming twin of operators.dedup.exact_dedup.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = spark.readStream.schema(DOCUMENT_SCHEMA).json(landing_dir)
    fp = src.select(
        "doc_id",
        F.md5(
            F.expr(
                "array_join(transform(array_sort(spans,"
                " (a, b) -> case when a.offset < b.offset then -1"
                " when a.offset > b.offset then 1 else 0 end),"
                " s -> lower(s.text)), ' ')"
            )
        ).alias("fingerprint"),
    )

    def emit_first(key, pdf_iter, state):
        seen = state.get[0] if state.exists else 0
        out = []
        for pdf in pdf_iter:
            if seen == 0 and len(pdf):
                first = pdf.sort_values("doc_id").iloc[[0]]
                out.append(first[["doc_id", "fingerprint"]])
                seen = 1
        state.update((seen,))
        if out:
            yield from out
        else:
            yield pd.DataFrame({"doc_id": [], "fingerprint": []})

    deduped = fp.groupBy("fingerprint").applyInPandasWithState(
        emit_first,
        outputStructType="doc_id string, fingerprint string",
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
