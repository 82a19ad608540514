"""PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query semantics of the
reference pipeline (akhilaSharon/pyspark-airflow-weather-etl — a
medallion Bronze→Silver→Gold→serving weather ETL), generalized into a
reusable DataFrame-in / DataFrame-out operator library plus a query
catalog, and extended with the operators a large-scale training-data
pipeline needs (dedup, similarity search, text analysis, multimodal
column plumbing, streaming rollups).

Design stance (see SURVEY.md §7):
- DataFrame/SQL only; Catalyst + AQE do the optimizing. No RDDs.
- Explicit StructType contracts everywhere (no schema inference).
- Built-in ``pyspark.sql.functions`` in the hot path; Arrow-batched
  pandas UDFs only where built-ins cannot express the semantics.
- Every operator is designed for a 1000-executor / 100 TB deployment
  and merely *tested* on local[32] fixtures.
"""

__version__ = "0.1.0"
