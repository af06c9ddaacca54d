"""takco_spark — a from-scratch, PySpark-native record-linkage engine.

Re-expresses the capabilities of karmaresearch/takco's table-clustering
pipeline (blocking → pairwise scoring → transitive clustering; see
/root/reference/takco/__init__.py:231-430 for the reference lifecycle) as an
idiomatic Spark batch system over interleaved text+media documents:

    documents(doc_id, spans: array<struct<kind,text,media_ref,offset>>)
      → blocking keys (salted token / MinHash-LSH)        [operators.blocking]
      → candidate pairs → vectorized pairwise similarity  [operators.scoring]
      → score aggregation + threshold → edge list         [functions.aggexpr]
      → iterative connected components                    [operators.components]
      → cluster-labelled documents (span sequence intact) [plans.pipeline]

Every stage is a pure DataFrame → DataFrame function, optionally checkpointed
with per-partition lineage + metrics so a run is resumable mid-stage
(reference analog: the step cache in /root/reference/takco/__init__.py:642-694).
"""

from takco_spark.session import get_spark
from takco_spark.config import PipelineConfig
from takco_spark.plans.pipeline import run_pipeline

__version__ = "0.1.0"

__all__ = ["get_spark", "PipelineConfig", "run_pipeline", "__version__"]
