"""lightweight_vector_database_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capabilities of the reference
``ChristophervonKlitzing/lightweight_vector_database`` (an in-memory kNN
vector database, see SURVEY.md) as idiomatic Spark DataFrame dataflow,
and extends them with the relational + LLM-data-pipeline surface
(dedup, similarity search, text analysis, streaming windows) designed
for 100 TB scale.

Layout:
- ``functions/``  — scalar/vector Column builders (distance metrics, text)
- ``operators/``  — dataflow operators (knn, knn_join, crud, dedup, asof, ...)
- ``sources/``    — table loaders for the driver parquet fixtures
- ``plans/``      — grid-index build + pruned kNN (reference §2A.4 analogue)
- ``streaming/``  — structured-streaming windows + batch twins
"""

__version__ = "0.1.0"
