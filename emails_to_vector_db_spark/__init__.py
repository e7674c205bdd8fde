"""emails_to_vector_db_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the reference repo ``zainjavedev/Emails-to-Vector-DB`` (a pgvector/ChromaDB
RAG pipeline; see SURVEY.md), re-expressed Spark-first:

- every relational operation the reference ships to PostgreSQL becomes a
  Catalyst-optimized DataFrame plan,
- the pgvector KNN search (reference ``rag.py:77-82``) becomes a native
  column-expression distance + ``TakeOrderedAndProject`` top-k,
- the embedding pipeline (reference ``rag.py:22-62``) becomes a vectorized
  Arrow/pandas-UDF stage behind a pluggable embedder interface,
- the email ingestion path (reference ``email_fetching.py``) becomes a
  batch/streaming DataFrame source with a MIME-parse UDF,
- plus the LLM-data-pipeline operators the reference lacks: dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
  similarity search (brute-force + LSH-bucketed ANN), text analysis, and
  multimodal column plumbing — all designed for 100 TB scale.

Layout:
    functions/   column-expression helpers (vector distances, text analysis,
                 deterministic hash embedder)
    operators/   composite operators (KNN top-k/join, dedup, ANN)
    sources/     table loaders, CSV/products reader, email/MIME source,
                 multimodal binary columns
    plans/       the oracle-checked query library (drives __spark_entry__)
    streaming/   Structured Streaming ingestion + windowed aggregations
    pipeline/    end-to-end embed-and-store / retrieval orchestration
"""

__version__ = "0.1.0"
