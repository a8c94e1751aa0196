"""spark_spotify — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of the
reference (donydony228/SpotifyDataPipeline): API ingestion -> document bronze ->
relational silver/gold star schema -> ~18 dashboard analytics queries, plus the
large-scale training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) the reference lacks.

Architecture is idiomatic Spark: everything is declared through the DataFrame /
Spark SQL API so Catalyst handles predicate pushdown, column pruning, broadcast
selection and AQE; Python UDFs are avoided on the hot path (the reference's
Python-side "UDF-like" functions are all re-expressed as native column
expressions per SURVEY.md §2.11).
"""

__version__ = "0.1.0"
