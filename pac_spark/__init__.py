"""pac_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference project ``saisrinivas194/pac_data_pipeline_2``
(two pandas ETL pipelines: an "issues" aggregation pipeline and an
entity-resolution pipeline), rebuilt Spark-first:

- declarative DataFrame/SQL plans (Catalyst optimizes: pushdown,
  pruning, join strategy, AQE skew handling),
- broadcast joins instead of the reference's N+1 point lookups
  (ref: index_align_to_firebase.py:155-166),
- distributed similarity joins with LSH blocking instead of the
  reference's O(n^2) driver loop (ref: executive_review_tool.py:304-324),
- plus the LLM-data-pipeline operator suite (dedup, similarity search,
  text analysis, multimodal plumbing) required for 100 TB training-data
  workloads.

Package map
-----------
- ``session``     : tuned SparkSession builder
- ``catalog``     : testdata table loading / temp-view registration
- ``functions``   : scalar expression helpers (normalization, fuzzy
                    similarity, exact money arithmetic, text metrics)
- ``operators``   : relational, issues-pipeline, entity-resolution,
                    dedup, similarity-search, text-analysis operators
- ``sources``     : readers (parquet/csv/jdbc/json) and keyed sinks
- ``streaming``   : Structured Streaming operators + batch equivalents
- ``plans``       : the query registry consumed by ``__spark_entry__``
"""

__version__ = "0.1.0"
