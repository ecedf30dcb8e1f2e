"""transf_spark — a PySpark-native analytics engine with the capabilities of
cnily03-hive/transf (a chunked, sessionized file-transfer pipeline), re-expressed
as DataFrame / SQL / Structured Streaming plans, plus the LLM-data-pipeline
operator set (dedup, similarity search, multimodal columns, text analysis).

Architecture (SURVEY.md §7):
- ``session``    — SparkSession factory with scale-aware defaults (AQE, UTC, Arrow).
- ``schemas``    — explicit, pinned StructTypes (the reference's fixed-schema
                   philosophy, SURVEY.md §1.3; no ``inferSchema`` anywhere).
- ``sources``    — parquet/binary loaders and derived protocol fixtures.
- ``functions``  — scalar Column-expression libraries (strings, hashes, vectors).
- ``operators``  — one module per operator family from SURVEY.md §2.
- ``streaming``  — Structured Streaming twins of the batch pipeline.
- ``queries``    — the declared query registry consumed by ``__spark_entry__``.

Everything is DataFrame-first: logical plans built with pyspark.sql, physical
strategy left to Catalyst/Tungsten + AQE. Python UDFs only where built-ins
genuinely cannot express the semantics (see operators/multimodal.py).
"""

__version__ = "0.1.0"
