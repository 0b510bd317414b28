"""bike_analyzer_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference repo Luizmasridista/bike-analyzer
(urban-mobility analytics: GBFS bike-share + weather ETL, KPI SQL
corpus, window/delta analytics, OD flow inference), built Spark-first:

- explicit StructType schemas + columnar Parquet (reference: SQLite
  row store, sql/schema.sql)
- DataFrame/Spark-SQL logical plans optimized by Catalyst (reference:
  SQLite VDBE + pandas)
- grouped-map pandas UDFs only for the one genuinely sequential
  kernel (greedy OD matching, reference od_inference.py:19-43)
- plus the large-scale training-data-pipeline operators the reference
  never had: dedup (exact/MinHash-LSH/SimHash/n-gram), similarity
  search over embeddings, text analysis, multimodal column plumbing.

Layout (SURVEY.md §7):
  session.py    SparkSession factory (AQE, Arrow, shuffle sizing)
  schemas.py    StructType constants (bike domain + testdata tables)
  sources/      readers: parquet catalog + temp-view registration
  functions/    portable column-expression library (hashes, tokens, shingles)
  operators/    query corpus: kpi, windows, od, text, dedup, similarity,
                multimodal — every entry registered in __spark_entry__
"""

__version__ = "0.1.0"
