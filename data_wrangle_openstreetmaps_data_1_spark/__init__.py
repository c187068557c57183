"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference repo ``kdivringi/data-wrangle-openstreetmaps-data_1``
(an OSM XML -> MongoDB wrangling pipeline), re-expressed Spark-first.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, Arrow, shuffle sizing)
- ``sources``    : OSM XML scan (S1/S2), parquet/JSONL sinks (S3/S4), testdata loaders
- ``functions``  : column-expression libraries (cleaning F1-F12, geo G1-G5,
                   text/hash/vector primitives for the LLM-pipeline operators)
- ``operators``  : composed DataFrame operators (reshape P6, clean W1-W8,
                   audit A8, dedup, similarity search, as-of join, sessionize)
- ``plans``      : the query registry backing ``__spark_entry__.py``
                   (queries() + DuckDB oracle_sql())
- ``streaming``  : Structured Streaming ingest variant (extension, SURVEY §7)

Design stance (SURVEY.md §7): pure DataFrame API, no RDDs; UDFs only where
column expressions can't reach (general point-in-polygon ray casting); every
operator written for 100 TB scale (broadcast small dims, partial aggs,
partition-prunable predicates, no driver-side materialization).
"""

__version__ = "0.1.0"
