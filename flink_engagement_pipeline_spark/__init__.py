"""PySpark-native analytics engine with the query / data-processing
capability surface of the reference streaming pipeline
(saqqaf/flink-engagement-pipeline), re-expressed Spark-first.

Layout:
    session.py    SparkSession factory (deterministic, oracle-friendly configs)
    schemas.py    explicit StructTypes for every input table (never inferred)
    sources/      batch + streaming source adapters, changelog/upsert emulation
    operators/    relational + windowing + dedup/similarity/text operators
    functions/    scalar expression helpers (JVM-side pyspark.sql.functions only)
    plans/        the query registry: each query = Spark callable + oracle SQL
    streaming/    Structured Streaming pipeline + pluggable foreachBatch sinks

The reference (read-only at /root/reference) is a PyFlink job:
Postgres CDC -> upsert-Kafka -> lookup join -> HOP window agg -> 3 sinks
(src/process.py, src/ingest.py). This engine reproduces that capability
surface on the driver-provided parquet fixtures with Spark DataFrame /
SQL / Structured Streaming, plus the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal columns).
"""

__version__ = "0.1.0"
