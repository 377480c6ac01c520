"""kafka_streams_homework_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference repo ``netology-ds-team/kafka-streams-homework`` (a Kafka
Streams pipeline: windowed per-product purchase sums with threshold
alerts — see ``SURVEY.md``), re-expressed Spark-first:

- batch semantics on the DataFrame/SQL API (Catalyst optimizes),
- streaming parity via Structured Streaming (watermarks + output modes
  replace the reference's punctuators and RocksDB stores),
- north-star LLM-data-pipeline extensions (dedup, similarity search,
  multimodal columns, text analysis) designed for 100 TB scale.

Layout:
    session     SparkSession factory with scale-aware defaults
    sources     batch parquet + Kafka source/sink wiring
    operators   relational / dedup / similarity / text / multimodal ops
    functions   reusable column expressions (pure, JVM-side)
    plans       plan-inspection helpers (explain, shuffle counting)
    streaming   Structured Streaming pipelines + stateful ops
    queries     the named-query registry backing __spark_entry__.py
"""

__version__ = "0.1.0"
