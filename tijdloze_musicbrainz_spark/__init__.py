"""tijdloze_musicbrainz_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ETL + entity-matching pipeline
(stijnvermeeren/tijdloze-musicbrainz), built idiomatically on the
DataFrame / Spark SQL / Catalyst stack, and extended with the
operators a large-scale training-data pipeline needs (dedup,
similarity search, text analysis, multimodal plumbing).

Layout
------
- ``session``    : SparkSession factory tuned for oracle-parity + scale
- ``catalog``    : explicit schemas + loaders for the test star schema
- ``sources``    : parquet / csv / json / jdbc readers
- ``functions``  : normalization, scoring, sort-key column builders
- ``operators``  : canonical selection, fuzzy match, upsert, dedup,
                   similarity, text analysis, multimodal plumbing
- ``plans``      : the query registry — every SURVEY.md §2 operator as
                   a (Spark builder, DuckDB oracle SQL) pair
- ``streaming``  : Structured Streaming variants of the event windows
"""

__version__ = "0.1.0"
