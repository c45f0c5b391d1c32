"""PySpark-native analytics engine with the query/data-processing
capabilities of PaulKenntner/Haensel_AMS_Data_Engineer_Challenge
(marketing-attribution ETL), rebuilt Spark-first.

Layout
------
- ``session``     SparkSession factory + engine confs (AQE, UTC, dynamic
                  partition overwrite, nanos-parquet compatibility).
- ``sources``     parquet readers for the driver testdata + the
                  attribution-domain schema mapping (FIXTURES.md §2).
- ``operators``   as-of join, IHC attribution, window flags, dedup,
                  similarity search, text analysis, chunk packing,
                  insert-if-absent sinks.
- ``plans``       composed pipelines (journey build -> score -> report),
                  mirroring the reference's main.py lifecycle as one lazy
                  DataFrame graph.
- ``streaming``   Structured Streaming variants (sessions as an event
                  stream).

Everything is expressed with the DataFrame API so Catalyst gets the whole
logical plan (predicate pushdown, column pruning, join planning, AQE).
"""

__version__ = "0.1.0"
