"""rxlan_aws_lakehouse_spark — a PySpark-native lakehouse analytics engine.

A from-scratch engine with the query and data-processing capabilities of the
reference lakehouse pipeline (saminenisriram/rxlan-aws-lakehouse: bronze NDJSON
landing -> typed/validated silver -> warehouse analytics), re-expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured Streaming
for the CDC path, and LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
    session      SparkSession factory (AQE, UTC, Arrow, dynamic partition overwrite)
    catalog      testdata star-schema table loading / view registration
    etl/         bronze scan -> normalize -> gold write (the reference's Glue path)
    streaming/   CDC micro-batch pipeline (Structured Streaming)
    ops/         reusable operators: as-of join, top-k, dedup, similarity, text
    queries/     named analytics queries (reference parity + relational + LLM)
"""

__version__ = "0.1.0"
