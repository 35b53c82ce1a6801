"""market_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference lakehouse
pipeline ``harshvardhanvn1/market-etl`` (see SURVEY.md): ingest utilities,
a schema-enforced CSV→Parquet ETL with data-quality filtering and Hive
partitioning, and a relational analytics corpus — plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB-scale Spark clusters.

Everything is declared through the DataFrame/SQL API so Catalyst owns the
physical plan: partition pruning, predicate pushdown, broadcast joins,
whole-stage codegen and AQE come for free.
"""

__version__ = "0.1.0"
