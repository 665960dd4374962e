"""maha_spark: a PySpark-native analytics engine with the query and
data-processing capabilities of yahoo/maha (semantic cube layer, reporting
request language, curators) plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal columns)."""

__version__ = "0.3.0"


def __getattr__(name):
    # lazy top-level conveniences: ``from maha_spark import MahaSparkEngine``
    # without importing pyspark at package-import time
    if name in ("MahaSparkEngine", "engine_for_dir"):
        from . import engine
        return getattr(engine, name)
    if name == "Registry":
        from .registry.cube import Registry
        return Registry
    if name == "get_spark":
        from .session import get_spark
        return get_spark
    raise AttributeError(name)
