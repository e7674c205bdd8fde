"""Email source: IMAP fetch → MIME parse → plain-text extraction → ingest.

Reference pipeline being re-expressed (``email_fetching.py``; SURVEY.md
§2.1 S3/S4, §2.2 P3/P5/P6/P7, U4):

- ``email_fetching.py:17-19,31-34``: IMAP connect, ``search ALL``, last-N
  slice, newest-first — here a *source adapter* that lands raw RFC822
  bytes into a DataFrame; the cluster never talks IMAP (one fetcher feeds
  a landing zone; executors parse in parallel).
- ``email_fetching.py:41-48``: ``message_from_bytes`` + ``msg.walk()`` +
  keep ``text/plain`` & drop ``text/html`` + join with newline — a parse
  UDF returning array<struct<content_type,body>> (U4), then explode →
  filter → re-concat (P7) as relational ops.
- ``email_fetching.py:49``: non-empty filter (P5).
- ``email_fetching.py:54-57``: Chroma add → EmbeddingStore.append with
  anti-join dedup (the reference crashes on duplicate ids; we don't).

The MIME parse is a pandas_udf (Arrow-batched): parsing is genuinely
imperative Python (stdlib ``email``), the one place SURVEY.md §1.3 allows
a Python lane. Everything downstream is built-in relational ops.
"""

from __future__ import annotations

import email
import email.policy
from email.message import EmailMessage

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    StringType,
    StructField,
    StructType,
)

PART_SCHEMA = ArrayType(
    StructType(
        [
            StructField("content_type", StringType()),
            StructField("body", StringType()),
        ]
    )
)

RAW_EMAIL_SCHEMA = StructType(
    [
        StructField("msg_id", StringType(), False),
        StructField("raw", BinaryType(), True),
    ]
)


@F.pandas_udf(PART_SCHEMA)
def parse_mime_parts(raw: pd.Series) -> pd.Series:
    """U4: RFC822 bytes → [(content_type, body)] for every leaf part.

    Mirrors ``email_fetching.py:41-48``: walk the part tree, decode each
    non-multipart payload to text; decoding errors are replaced, never
    raised (bad bytes shouldn't kill a 100 TB ingest)."""

    def one(b) -> list[tuple[str, str]]:
        if b is None:
            return []
        try:
            msg = email.message_from_bytes(bytes(b))
        except Exception:
            return []
        parts = []
        for part in msg.walk():
            if part.get_content_maintype() == "multipart":
                continue
            payload = part.get_payload(decode=True)
            if payload is None:
                payload = b""
            parts.append(
                (
                    part.get_content_type(),
                    payload.decode("utf-8", errors="replace"),
                )
            )
        return parts

    return raw.apply(one)


def extract_plain_text(
    df: DataFrame, *, id_col: str = "msg_id", raw_col: str = "raw"
) -> DataFrame:
    """P7 + P3 + P5: parse → explode parts → keep text/plain → newline-join
    per message → drop empties. Returns (msg_id, text).

    The explode/filter/groupBy is pure relational algebra: Catalyst plans
    one shuffle (the re-concat groupBy on msg_id); part order inside a
    message is preserved via posexplode ordering."""
    parts = df.select(
        F.col(id_col),
        F.posexplode_outer(parse_mime_parts(F.col(raw_col))).alias(
            "part_idx", "part"
        ),
    )
    plain = parts.where(F.col("part.content_type") == "text/plain")
    texts = (
        plain.groupBy(id_col)
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("part_idx", "part.body"))
                    ),
                    lambda s: s.getField("body"),
                ),
            ).alias("text")
        )
        .where(F.length("text") > 0)
    )
    return texts


def ingest_emails(
    spark: SparkSession,
    raw_df: DataFrame,
    store,
    embedder,
) -> int:
    """The full ``fetch_and_store_emails`` pipeline (``email_fetching.py:
    30-62``) minus the network: raw messages → plain text → embed →
    idempotent store append. Returns rows written."""
    from emails_to_vector_db_spark.pipeline.store import embed_and_store

    texts = extract_plain_text(raw_df)
    return embed_and_store(
        spark, texts, store, embedder, id_col="msg_id", content_col="text"
    )


def fetch_imap_to_dataframe(
    spark: SparkSession,
    *,
    url: str,
    user: str,
    password: str,
    mailbox: str = "inbox",
    last_n: int = 10,
) -> DataFrame:
    """S3/S4: the IMAP fetch (``email_fetching.py:17-40``) as a source
    adapter. Network fetch happens on the driver (a mailbox is a single
    serial endpoint — parallelizing the TLS session buys nothing); parsing
    and embedding are distributed downstream.

    Requires network access; in this offline environment it exists for
    API completeness and is exercised only via synthetic_emails()."""
    import imaplib

    conn = imaplib.IMAP4_SSL(url)
    conn.login(user, password)
    conn.select(mailbox)
    _, data = conn.search(None, "ALL")
    ids = data[0].split()[-last_n:]
    rows = []
    for mid in reversed(ids):  # newest first, as email_fetching.py:34
        _, msg_data = conn.fetch(mid, "(RFC822)")
        rows.append((mid.decode(), msg_data[0][1]))
    conn.logout()
    return spark.createDataFrame(rows, RAW_EMAIL_SCHEMA)


def synthetic_email_row(i: int) -> tuple[str, bytes]:
    """One deterministic MIME fixture row (pure function of ``i`` — the
    property that lets the Python DataSource connector generate any index
    range independently on any executor). Kinds cycle: multipart
    plain+html, plain singlepart, html-only (exercises the P5 empty
    filter), two plain parts (order-preserving re-concat)."""
    kind = i % 4
    if kind == 0:  # multipart: plain + html
        msg = EmailMessage()
        msg["Subject"] = f"order update {i}"
        msg.set_content(f"plain body {i}\nline two of {i}")
        msg.add_alternative(
            f"<html><body>html body {i}</body></html>", subtype="html"
        )
    elif kind == 1:  # plain singlepart
        msg = EmailMessage()
        msg["Subject"] = f"receipt {i}"
        msg.set_content(f"receipt text {i} total {i * 10}$")
    elif kind == 2:  # html only -> no plain text -> filtered out (P5)
        msg = EmailMessage()
        msg["Subject"] = f"promo {i}"
        msg.add_alternative(
            f"<html><body>promo only html {i}</body></html>",
            subtype="html",
        )
    else:  # two plain parts (tests part-order preserving re-concat)
        msg = EmailMessage()
        msg.set_content(f"part one of {i}")
        msg.add_attachment(
            f"part two of {i}".encode(),
            maintype="text",
            subtype="plain",
            filename=f"note{i}.txt",
        )
    if msg.is_multipart():
        # stdlib generates a RANDOM multipart boundary per serialization;
        # pin it so the row is a pure function of ``i`` at byte level
        # (the DataSource connector and the parquet fixture must agree).
        msg.set_boundary(f"==bnd-{i:04d}==")
    return (f"m{i:04d}", msg.as_bytes())


BROKEN_EMAIL_ROW = ("broken", b"\xff\xfe not an email at all")


def synthetic_email_rows(n: int = 20) -> list[tuple[str, bytes]]:
    """Deterministic MIME fixture rows per FIXTURES.md §B (pure Python —
    no Spark session needed, so the same bytes can be landed as a parquet
    fixture for the DuckDB oracle), plus a broken-bytes message."""
    return [synthetic_email_row(i) for i in range(n)] + [BROKEN_EMAIL_ROW]


def synthetic_emails(spark: SparkSession, n: int = 20) -> DataFrame:
    """synthetic_email_rows as a DataFrame."""
    return spark.createDataFrame(synthetic_email_rows(n), RAW_EMAIL_SCHEMA)


def reference_extract_text(raw: bytes) -> str:
    """Straight-line reference implementation of the extraction the Spark
    pipeline performs distributed (``email_fetching.py:41-49``): walk the
    MIME tree, keep decoded ``text/plain`` leaf parts in order, join with
    a newline. Returns "" when no plain text (the P5 filter drops it).

    Used ONLY to land the expected-output parquet fixture for the DuckDB
    oracle — the differential check then proves the distributed parse →
    explode → filter → order-preserving re-concat pipeline produces
    byte-identical text to this sequential form."""
    try:
        msg = email.message_from_bytes(bytes(raw))
    except Exception:
        return ""
    parts = []
    for part in msg.walk():
        if part.get_content_maintype() == "multipart":
            continue
        if part.get_content_type() != "text/plain":
            continue
        payload = part.get_payload(decode=True)
        if payload is None:
            payload = b""
        parts.append(payload.decode("utf-8", errors="replace"))
    return "\n".join(parts)
