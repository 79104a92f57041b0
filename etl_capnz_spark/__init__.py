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

from etl_capnz_spark.session import get_session, read_table

__all__ = ["get_session", "read_table"]
__version__ = "0.2.0"

# Operator families live in submodules (imported lazily by callers so a
# bare `import etl_capnz_spark` stays cheap):
#   operators.extract     T1-T8 feed-link extraction + filters
#   operators.geometry    G1-G5 polygon/circle/centroid
#   operators.features    F1-F3 feature fan-out
#   operators.dedup       exact/MinHash-LSH/SimHash/Jaccard/PPJoin/edit
#   operators.similarity  brute/IVF/SRP/PQ ANN + quantization
#   operators.text        quality/lang-ID/TF-IDF/LM-score/PMI/PII
#   operators.sampling    deterministic/stratified/weighted/packing
#   operators.audit       table fingerprints + snapshot diff
#   operators.graph       PageRank
#   sources, sinks, streaming, functions, plans — per README layout
