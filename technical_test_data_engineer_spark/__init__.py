"""technical_test_data_engineer_spark — a PySpark-native analytics engine.

A brand-new engine re-expressing the capability surface of
``ebocq/technical-test-data-engineer`` (ingest → store → clean → join →
aggregate → window → explode → serve) as idiomatic, Catalyst-optimized
Spark, extended with LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB scale.

Design stance (SURVEY.md §7): lazy DataFrames + Spark SQL over declared
schemas; Catalyst does the optimizing; built-in JVM functions in every
hot path; Pandas UDFs only where built-ins genuinely cannot express the
semantics.
"""

__version__ = "0.1.0"

from technical_test_data_engineer_spark.session import get_spark  # noqa: F401
