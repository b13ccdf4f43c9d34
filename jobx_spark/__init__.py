"""jobx_spark — a PySpark-native analytics/pipeline engine.

A from-scratch re-expression of the capabilities of the reference
MapReduce job engine (dsoprea/JobX: NSQ/etcd-backed mapper/combiner/
reducer pipelines — see SURVEY.md) as an idiomatic Apache Spark
DataFrame engine, plus a relational query surface and large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal column plumbing).

Layout:
    session      — tuned SparkSession factory
    catalog      — workflow/job/step/handler registry (ref: mr/models/kv/*)
    handlers     — handler registration, argument casting, scope injection
    engine       — the map/combine/reduce execution loop (ref: mr/job_engine.py)
    sessions     — keyed session side-state (ref: mr/models/kv/trees/sessions.py)
    result_writers — inline/file/http/email sinks (ref: mr/result_writers/*)
    trace        — invocation/step graph trace (ref: mr/trace.py)
    sources      — table loaders / format scans
    operators    — dedup, similarity, text, multimodal, relational extras
    functions    — deterministic cross-engine scalar helpers
    plans        — explain/plan inspection utilities
    streaming    — structured-streaming surface
"""

__version__ = "0.1.0"

from jobx_spark.session import get_spark  # noqa: F401
