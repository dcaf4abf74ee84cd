"""PySpark-native CDC / incremental-ingest analytics engine.

A from-scratch re-expression of the capabilities of the reference
``scalabreseGD/techtalk-data-pipeline-snowpark`` (Snowpark streams / stages /
transactions / MERGE pipelines) on idiomatic PySpark:

- ``lake``       versioned parquet table format with atomic commits
                 (plays the role of Snowflake tables + transactions)
- ``cdc``        change-event replay engine: max-LSN dedup, schema
                 evolution, exactly-once epochs (plays the role of
                 Snowflake streams + MERGE-in-transaction)
- ``functions``  Snowpark-semantics shims + vectorized pandas/Arrow UDFs
- ``operators``  analytics parity pipelines + training-data ops
                 (dedup, similarity search, text analysis, multimodal)
- ``pipeline``   DAG orchestrator with ``>>`` composition + continuous mode
- ``streaming``  Structured Streaming file-arrival ingest (stage parity)
"""

__version__ = "0.1.0"
