"""wistia_etl_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the reference ETL pipeline (``coltonromannose/wistia-etl-pipeline``, a
Glue/S3/Redshift medallion pipeline), re-expressed Spark-first:

- declarative DataFrame / Spark SQL logical plans (Catalyst optimizes),
- explicit schemas instead of inference,
- in-engine MERGE instead of stored-procedure hops,
- Structured Streaming for the incremental/watermark machinery,
- plus large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal column plumbing) designed for 100 TB.

Layout
------
- ``session``      SparkSession factory tuned for scale (AQE, UTC, Arrow)
- ``schemas``      explicit StructTypes for raw/conformed tables
- ``sources``      JSON readers, REST paginated source, state store, writers
- ``operators``    flatten/dedup/merge/rollup/joins/windows
- ``incremental``  watermark + checkpoint state machine (batch)
- ``streaming``    Structured Streaming variant of the pipeline
- ``functions``    scalar surface + text/dedup/similarity/multimodal ops
"""

__version__ = "0.1.0"
