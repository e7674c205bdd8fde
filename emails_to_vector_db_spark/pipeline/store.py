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

Scale notes: the anti-join's build side is the EXISTING store projected to
its id column only — Catalyst broadcasts it while the id set is small and
falls back to a shuffled sort-merge anti join once it isn't (Spark cannot
broadcast the stream side of a left_anti join, so "broadcast the new
batch" is not an available plan shape). The deduped batch is persisted
before the row count so the upstream pipeline — including the embedding
pandas_udf — executes exactly once per append.
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
        # observe(): the row count rides the WRITE job itself — one job,
        # no persist, and the embedding pandas_udf runs exactly once per
        # append (the earlier persist+count+write form held the batch in
        # executor memory and still ran two jobs). An all-duplicate batch
        # appends a zero-row part file: harmless, and cheaper than a
        # pre-count that would double-run a real model to find out.
        from pyspark.sql import Observation

        obs = Observation()
        batch = batch.observe(obs, F.count(F.lit(1)).alias("n"))
        batch.write.mode("append").parquet(self.path)
        return int(obs.get["n"])

    def compact(self, target_partitions: int | None = None) -> int:
        """Small-file compaction: incremental appends accumulate one file
        per append-partition; periodic compaction rewrites the store into
        well-sized files (the standard housekeeping job any 100 TB
        parquet store needs). Returns the new file-partition count.

        Atomicity: the final swap is ``mode("overwrite")`` on the live
        path, which is NOT atomic — a crash mid-swap can leave the store
        partial, recoverable from the ``__compacting`` copy (which is only
        deleted after the swap completes). A production deployment should
        compact through a table format with atomic commits (Delta/Iceberg
        metadata swap) instead of raw parquet directories."""
        df = self.read()
        if target_partitions is None:
            target_partitions = max(1, df.rdd.getNumPartitions() // 4)
        tmp = self.path + "__compacting"
        df.repartition(target_partitions).write.mode("overwrite").parquet(tmp)
        # swap: overwrite the store from the compacted copy; the tmp copy
        # stays on disk until the swap succeeds, then is removed.
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(self.path)
        jvm = self.spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(tmp)
        fs = jpath.getFileSystem(
            self.spark.sparkContext._jsc.hadoopConfiguration()
        )
        fs.delete(jpath, True)
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
