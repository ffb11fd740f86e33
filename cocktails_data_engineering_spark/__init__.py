"""cocktails_data_engineering_spark — a PySpark-native analytics engine.

Brand-new implementation of the data-processing surface of the reference
project ``AJTheDataGuy/cocktails_data_engineering`` (a pandas/requests web
crawler that builds a link graph + document store), re-expressed as
idiomatic Spark DataFrame / SQL pipelines and extended with the operators a
large-scale (100 TB) training-data pipeline needs: deduplication,
similarity search, multimodal columns, and text analysis.

Layout
------
- ``session``     SparkSession factory (AQE on, tuned shuffle partitions)
- ``registry``    query registry: (name -> spark fn, oracle SQL)
- ``sources/``    parquet/jdbc/text/binary readers and writers
- ``functions/``  scalar column functions (link ops, text ops, vector ops)
- ``operators/``  DataFrame-level operators (relational, graph, dedup, ...)
- ``plans/``      the assembled query surface (imports all operators)
- ``streaming/``  Structured Streaming pipelines
"""

__version__ = "0.1.0"
