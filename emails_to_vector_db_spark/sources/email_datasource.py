"""A Spark 4 Python DataSource connector for the email corpus.

SURVEY.md S3 maps the reference's IMAP source (``email_fetching.py:
17-19,31-32``) to "Spark 4 DataSource API if a native connector is
wanted" — this is that connector. Instead of materializing a mailbox on
the driver and ``createDataFrame``-ing it (driver memory, no
parallelism), the source reports N range partitions and each executor
task generates/fetches its own slice — the same split-claiming shape a
real IMAP/Graph-API connector uses (each partition owning a message-id
range).

Usage::

    spark.dataSource.register(EmailCorpusDataSource)
    raw = (spark.read.format("email_corpus")
           .option("n", "40").option("numPartitions", "4").load())

The corpus is the deterministic MIME fixture (sources/emails.py), a pure
function of the message index, so any partition can produce its range
independently — standing in for per-range server fetches without network
in tests. The optional broken-bytes message lands in the last partition.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int, with_broken: bool):
        self.start = start
        self.end = end
        self.with_broken = with_broken


class EmailCorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", "20"))
        self.num_partitions = max(1, int(options.get("numPartitions", "4")))
        self.include_broken = (
            options.get("includeBroken", "true").lower() == "true"
        )

    def partitions(self):
        per = -(-self.n // self.num_partitions)  # ceil div
        parts = []
        for p in range(self.num_partitions):
            start, end = p * per, min((p + 1) * per, self.n)
            if start >= end and not (
                p == self.num_partitions - 1 and self.include_broken
            ):
                continue
            parts.append(
                _IdRange(
                    start,
                    end,
                    self.include_broken and p == self.num_partitions - 1,
                )
            )
        return parts

    def read(self, partition: _IdRange):
        # Executor-side: generate (or, in a real connector, fetch) only
        # this partition's id range.
        from emails_to_vector_db_spark.sources.emails import (
            BROKEN_EMAIL_ROW,
            synthetic_email_row,
        )

        for i in range(partition.start, partition.end):
            yield synthetic_email_row(i)
        if partition.with_broken:
            yield BROKEN_EMAIL_ROW


class EmailCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "email_corpus"

    def schema(self) -> str:
        return "msg_id string, raw binary"

    def reader(self, schema) -> EmailCorpusReader:
        return EmailCorpusReader(self.options)
