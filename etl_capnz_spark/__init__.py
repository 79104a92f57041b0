"""etl_capnz_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of TAK-NZ/etl-capnz (CAP 1.2 alert ETL →
GeoJSON features), re-expressed Spark-first, plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Design: DataFrame/SQL only in the hot path — every reference operator
decomposes into built-in Catalyst expressions (see SURVEY.md §2). Python
reaches executors only via Arrow-batched ``mapInPandas`` for HTTP fetch and
the optional XML fallback.
"""

from etl_capnz_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
