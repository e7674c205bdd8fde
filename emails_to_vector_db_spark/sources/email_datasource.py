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
    SimpleDataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
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
        # pushdown state: generate only [lo, hi) of the m-id range
        self.lo = 0
        self.hi = self.n

    def pushFilters(self, filters):
        """Predicate pushdown on ``msg_id``: range/equality filters narrow
        the generated index range at the SOURCE (the connector analogue
        of a server-side search), instead of generating every message and
        filtering in Spark. Ids are fixed-width (``m0007``), so lexical
        string order equals numeric index order and each comparison maps
        to an index bound. The special ``broken`` row sorts before every
        m-id; each supported filter is also evaluated against it
        directly. Unsupported filters are returned for Spark to apply."""
        import operator as op

        cmp = {
            EqualTo: op.eq,
            GreaterThan: op.gt,
            GreaterThanOrEqual: op.ge,
            LessThan: op.lt,
            LessThanOrEqual: op.le,
        }
        for f in filters:
            if isinstance(f, IsNotNull) and tuple(f.attribute) == ("msg_id",):
                continue  # ids are never null — trivially satisfied
            if type(f) in cmp and tuple(f.attribute) == ("msg_id",):
                v = f.value
                if isinstance(v, str) and (
                    (v.startswith("m") and v[1:].isdigit()) or v <= "m"
                ):
                    # the broken row: evaluate the predicate on it directly
                    self.include_broken = self.include_broken and cmp[type(f)](
                        "broken", v
                    )
                    if v.startswith("m") and v[1:].isdigit():
                        idx = int(v[1:])
                        if isinstance(f, EqualTo):
                            self.lo = max(self.lo, idx)
                            self.hi = min(self.hi, idx + 1)
                        elif isinstance(f, GreaterThan):
                            self.lo = max(self.lo, idx + 1)
                        elif isinstance(f, GreaterThanOrEqual):
                            self.lo = max(self.lo, idx)
                        elif isinstance(f, LessThan):
                            self.hi = min(self.hi, idx)
                        else:  # LessThanOrEqual
                            self.hi = min(self.hi, idx + 1)
                    else:
                        # v sorts before every m-id ('broken', '', ...):
                        # the comparison is uniform across all m-ids
                        if not cmp[type(f)]("m0000", v):
                            self.hi = self.lo  # empty m-range
                    continue
            yield f

    def partitions(self):
        span = max(0, self.hi - self.lo)
        per = max(1, -(-span // self.num_partitions))  # ceil div
        parts = []
        for p in range(self.num_partitions):
            start = self.lo + p * per
            end = min(start + per, self.hi)
            last = p == self.num_partitions - 1
            if start >= end and not (last and self.include_broken):
                continue
            parts.append(
                _IdRange(start, max(start, end), last and self.include_broken)
            )
        if not parts:  # fully pruned: one empty partition keeps Spark happy
            parts.append(_IdRange(0, 0, False))
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

    def simpleStreamReader(self, schema) -> "EmailCorpusStreamReader":
        return EmailCorpusStreamReader(self.options)


class EmailCorpusStreamReader(SimpleDataSourceStreamReader):
    """Streaming flavor of the connector (Spark 4 Python DataSource
    streaming API): the mailbox grows monotonically, and each micro-batch
    reads the message-id range [start, latest) — exactly how an
    incremental IMAP poller advances its UIDNEXT watermark. Offsets are
    {"idx": n}; ``readBetweenOffsets`` replays a committed range
    deterministically for exactly-once recovery (the corpus is a pure
    function of the index, like a server re-fetch by UID range).

    ``batchSize`` caps how many messages one micro-batch admits —
    bounded-batch ingestion, the streaming twin of the reference's
    last-N slice (``email_fetching.py:33``)."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", "20"))
        self.batch_size = max(1, int(options.get("batchSize", "8")))
        self.include_broken = (
            options.get("includeBroken", "true").lower() == "true"
        )

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def _last_idx(self) -> int:
        # index n is the broken-bytes message (same corpus as the batch
        # reader with includeBroken)
        return self.n + (1 if self.include_broken else 0)

    def _rows(self, start: int, end: int) -> list:
        from emails_to_vector_db_spark.sources.emails import (
            BROKEN_EMAIL_ROW,
            synthetic_email_row,
        )

        # a LIST, not a generator: the prefetched batch is pickled into
        # the offset log for deterministic replay
        return [
            BROKEN_EMAIL_ROW if i == self.n else synthetic_email_row(i)
            for i in range(start, end)
        ]

    def read(self, start: dict):
        lo = int(start["idx"])
        hi = min(self._last_idx(), lo + self.batch_size)
        if hi == lo:
            # Drained mailbox: end == start. Spark's prefetch wrapper
            # asserts this batch is empty by calling next() on it
            # (datasource_internal.add_result_to_cache), so it MUST be
            # an iterator — a list raises TypeError and kills the
            # stream right after the final real batch.
            return iter(()), {"idx": hi}
        return self._rows(lo, hi), {"idx": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["idx"]), int(end["idx"]))
