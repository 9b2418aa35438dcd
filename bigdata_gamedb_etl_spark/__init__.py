"""bigdata_gamedb_etl_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of evelyn-Lu7/BigData-GameDB-ETL
(see SURVEY.md), rebuilt Spark-first, plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing)."""

__version__ = "0.1.0"
