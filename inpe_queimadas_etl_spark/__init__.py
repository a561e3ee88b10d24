"""inpe_queimadas_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ETL system
(rafaelparanhoss/inpe-queimadas-etl, surveyed in /root/repo/SURVEY.md)
as an idiomatic Spark DataFrame/SQL engine, plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) such an engine needs at 100 TB scale.

Layout
------
- ``session``    SparkSession factory tuned for local testing but
                 configured with scale-ready defaults (AQE, dynamic
                 partition overwrite, Arrow).
- ``schemas``    explicit StructTypes for every layer table.
- ``sources``    CSV ingest with dialect sniffing + fuzzy column
                 resolution (reference: src/etl/extract, transform).
- ``functions``  scalar column helpers (event hash, cleansing,
                 decimal-comma cast, event-day coalesce).
- ``operators``  reusable distributed operators: relational helpers
                 (zero-fill, top-1-per-group, moving averages),
                 dedup family, similarity search, text analysis,
                 multimodal column plumbing, geo joins.
- ``plans``      explain/inspection helpers for plan review.
- ``streaming``  Structured Streaming foreachBatch wrapper over the
                 batch pipeline.
- ``suite``      the declared query suite: name -> (Spark callable,
                 DuckDB oracle SQL) consumed by __spark_entry__.py.
"""

__version__ = "0.1.0"
