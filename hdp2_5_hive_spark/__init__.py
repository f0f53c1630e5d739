"""hdp2_5_hive_spark — a PySpark-native analytics engine with the query
surface of Apache Hive 1.2.1 (reference: OpenPOWER-BigData/HDP2.5-Hive).

Architecture (SURVEY.md §7): Hive's operator DAG (reference
``ql/src/java/org/apache/hadoop/hive/ql/exec/Operator.java:56``) is
re-expressed as declarative Spark DataFrame / SQL plans so Catalyst +
Tungsten pick the physical strategy. This package provides:

- ``session``    — SparkSession factory with Hive-parity configs
                   (NULL-on-error casts, UTC timestamps).
- ``catalog``    — table loading / temp-view registration over the
                   driver parquet testdata (metastore stand-in).
- ``functions``  — Hive-semantics expression shims over
                   ``pyspark.sql.functions``.
- ``operators``  — DataFrame-composing operators: joins, aggregates,
                   windows, dedup, similarity search, text analysis,
                   multimodal column plumbing.
- ``queries``    — the named query registry consumed by
                   ``__spark_entry__.py`` (each entry has a Spark
                   callable + a DuckDB oracle SQL string).
- ``sources``    — read/write facade (parquet/orc/csv/json/avro).
- ``streaming``  — Structured-Streaming ingest (Hive streaming-ingest
                   API equivalent, reference
                   ``hcatalog/streaming/.../HiveEndPoint.java:62``).
"""

__version__ = "0.1.0"
