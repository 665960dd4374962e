"""maha_spark: a PySpark-native analytics engine with the query and
data-processing capabilities of yahoo/maha (semantic cube layer, reporting
request language, curators) plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal columns)."""

__version__ = "0.1.0"
