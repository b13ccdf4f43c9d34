"""Large-scale data-pipeline operators: dedup, similarity search, text
analysis, multimodal column plumbing.

These extend the reference's surface (SURVEY.md §2.3) with the
operators an LLM-training-data pipeline needs, each designed for the
100 TB regime: JVM-side expressions wherever possible, shuffles bounded
by blocking/banding rather than O(n²) pair enumeration, Pandas UDFs only
where Spark's built-ins genuinely can't express the semantics.
"""
