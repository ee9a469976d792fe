"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference NYC-Government-Hiring-Audit-Data-Platform
(medallion batch ETL: paginated-API ingestion -> BRONZE lineage tables ->
two-stage fuzzy-title similarity joins -> GOLD projections/aggregations ->
paginated serving), re-expressed Spark-first for 100 TB scale.

Layout
------
- ``session``    : SparkSession factory (AQE, Arrow, UTC, tuned shuffle).
- ``schemas``    : explicit StructTypes for domain + testdata tables.
- ``functions``  : pure Column expression library (text normalization,
                   dates, similarity) - JVM-side, codegen-friendly.
- ``operators``  : relational operator library, fuzzy similarity joins,
                   dedup, similarity search, text analysis, multimodal.
- ``sources``    : paginated REST API source, parquet helpers, xlsx.
- ``plans``      : BRONZE registration and GOLD table builds (EP1-EP3).
- ``streaming``  : Structured Streaming incremental ingest + windowed aggs.
"""

__version__ = "0.1.0"
