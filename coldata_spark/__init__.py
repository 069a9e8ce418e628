"""coldata_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Collaborative-AI/coldata.

The reference (/root/reference) is a dataset-metadata search engine:
crawl -> upsert-dedup document store -> chunk -> embed -> vector index ->
top-k similarity search -> group-best -> join-back -> project.  This package
re-expresses every stage as idiomatic Spark DataFrame plans (SURVEY.md §2),
plus LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Layout:
  session.py    — SparkSession factory tuned for the target cluster shape
  tables.py     — fixture/catalog table loaders
  registry.py   — query registry backing __spark_entry__ (driver contract)
  functions/    — reusable Column-level expression builders (text, vector)
  operators/    — composite operators (dedup, similarity, upsert, search)
  queries/      — registered, oracle-checkable query plans
  streaming/    — Structured Streaming surface for the events table
  ingest/       — crawl/ingest framework (seed DF -> fetch UDF -> merge)
"""

__version__ = "0.1.0"
