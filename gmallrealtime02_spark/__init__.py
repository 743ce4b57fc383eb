"""gmallrealtime02_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference real-time e-commerce warehouse (whb-bigdata/gmallrealtime02),
re-expressed Spark-first: DataFrame/SQL + Catalyst for batch semantics,
Structured Streaming for the dataflows, dt-partitioned parquet for the
serving layer, plus LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) designed for 100 TB scale.

Layout:
    session      SparkSession factory (AQE, UTC, tuned shuffle partitions)
    schemas      StructType declarations for every logical table/envelope
    sources      batch + streaming source builders (parquet, kafka, memory)
    operators    the reference's operator inventory as pure DF->DF functions
    functions    scalar/text/similarity column function libraries
    streaming    Structured Streaming jobs wrapping the same operators
"""

__version__ = "0.1.0"
