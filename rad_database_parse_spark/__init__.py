"""rad_database_parse_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL pipeline (``grover-dev/rad-database-parse``), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, columnar
Parquet storage, shuffle-aware joins and aggregations, plus the
LLM-data-pipeline operator surface (dedup, similarity search, text analysis,
multimodal columns) the reference's north star calls for.

Layout
------
- ``session``    : tuned SparkSession factory
- ``catalog``    : canonical StructType schemas + parquet IO helpers
- ``operators``  : core relational/ETL operators (SURVEY.md §2A/§2B)
- ``llm``        : dedup / similarity / text-analysis / multimodal operators
- ``sources``    : file sources incl. the binaryFile+mapInPandas PDF path
- ``streaming``  : Structured Streaming surface over the events table
- ``plans``      : plan-inspection helpers (pushdown/broadcast assertions)
- ``registry``   : the query inventory exported through __spark_entry__.py
"""

__version__ = "0.1.0"
