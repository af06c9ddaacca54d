"""Incremental ingestion (optional — the reference is purely batch).

SURVEY.md §2.9: takco has no temporal streaming; the north rule's
"streaming-like" demands are resumability + lineage, satisfied by the batch
checkpoints (sources/checkpoint.py). This module adds the one genuinely
useful streaming surface for a document pipeline: INCREMENTAL INGESTION —
new document files appear in a landing directory and are appended to the
bronze document table exactly-once via Structured Streaming file-source
tracking.
"""

from takco_spark.streaming.incremental_er import (
    compact_state,
    incremental_er_stream,
    latest_labels,
    link_batch,
)
from takco_spark.streaming.ingest import ingest_documents_stream

__all__ = [
    "compact_state",
    "incremental_er_stream",
    "ingest_documents_stream",
    "latest_labels",
    "link_batch",
]
