"""spectraplex_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference `user1303836/spectraplex`
(a Rust medallion-architecture blockchain indexing/ETL pipeline), rebuilt
Spark-first: DataFrame/SQL declarative plans optimized by Catalyst, Parquet
columnar storage, Structured Streaming for the streaming surface, and
LLM-data-pipeline extension operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Layout:
  schemas      — explicit StructTypes for bronze/silver/solana-JSON (SURVEY §1)
  session      — scale-aware SparkSession builder
  sources      — parquet/JSONL IO + idempotent append protocol (SURVEY §2.1)
  operators    — normalize (U1), dedup (E1), simsearch (E2), textops (E4),
                 multimodal (E3)
  functions    — scalar helpers: exact-decimal money math, deterministic ids
  plans        — the query catalog: reference serving/report queries +
                 relational operator coverage, each with a DuckDB oracle twin
  streaming    — Structured Streaming ingest/normalize (SURVEY §2.9)
"""

__version__ = "0.1.0"
