"""Alternate source formats: JSON Lines and ORC copies of the events
table, landed write-once per scale factor so the engine's JSON/ORC
reader paths are exercised against the SAME rows the parquet oracle
sees (SURVEY.md §2.1 — the reference reads only CSV; a warehouse user
expects every mainstream format to scan into the same plans).

Both copies are produced with pyarrow (no Spark session, no jobs,
idempotent): timestamps are carried as epoch microseconds (bigint) in
the copies, exactly how the parquet fixture itself stores nanos — the
reader normalizes to TimestampType the same way ``load_table`` does, so
format choice cannot leak into query results. Avro is NOT covered: the
spark-avro connector is a separate package not present in this
container (documented gate, like sentence-transformers).
"""

from __future__ import annotations

import json
import os

FORMATS_VERSION = 1


def _formats_dir(sf_dir: str) -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    sf = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(
        root, "spark-warehouse", f"formats_v{FORMATS_VERSION}", sf
    )


def ensure_format_copies(sf_dir: str) -> dict[str, str]:
    """Write events as JSONL and ORC (if absent); return name → path."""
    import pyarrow as pa
    import pyarrow.orc as orc
    import pyarrow.parquet as pq

    d = _formats_dir(sf_dir)
    paths = {
        "events_jsonl": os.path.join(d, "events.jsonl"),
        "events_orc": os.path.join(d, "events.orc"),
    }
    src = os.path.join(sf_dir, "events.parquet")
    # Staleness guard: the driver may regenerate the fixture between
    # rounds — a copy older than its source is rewritten, not trusted.
    src_mtime = os.path.getmtime(src)
    if all(
        os.path.exists(p) and os.path.getmtime(p) >= src_mtime
        for p in paths.values()
    ):
        return paths
    os.makedirs(d, exist_ok=True)

    tbl = pq.read_table(src)
    # → micros as plain int64 (the copies carry epoch_us, the readers
    # rebuild TimestampType — identical to load_table's handling).
    # Fixture generations store ts as either INT64 epoch-nanos or a real
    # timestamp type; normalize from whichever the file has.
    ts_col = tbl["ts"]
    if pa.types.is_timestamp(ts_col.type):
        ts_us = ts_col.cast(pa.timestamp("us")).cast("int64").to_pylist()
    else:
        ts_us = [v // 1000 for v in ts_col.cast("int64").to_pylist()]
    cols = {
        "event_id": tbl["event_id"].to_pylist(),
        "ts_us": ts_us,
        "user_id": tbl["user_id"].to_pylist(),
        "event_type": tbl["event_type"].to_pylist(),
        "value": tbl["value"].to_pylist(),
        "props": tbl["props"].to_pylist(),
    }

    tmp = paths["events_jsonl"] + ".tmp"
    with open(tmp, "w") as f:
        for i in range(len(ts_us)):
            f.write(
                json.dumps({k: cols[k][i] for k in cols}, sort_keys=True)
            )
            f.write("\n")
    os.replace(tmp, paths["events_jsonl"])

    out = pa.table(
        {
            "event_id": pa.array(cols["event_id"], pa.int64()),
            "ts_us": pa.array(cols["ts_us"], pa.int64()),
            "user_id": pa.array(cols["user_id"], pa.int64()),
            "event_type": pa.array(cols["event_type"], pa.string()),
            "value": pa.array(cols["value"], pa.float64()),
            "props": pa.array(cols["props"], pa.string()),
        }
    )
    tmp = paths["events_orc"] + ".tmp"
    orc.write_table(out, tmp)
    os.replace(tmp, paths["events_orc"])
    return paths


EVENTS_COPY_SCHEMA = (
    "event_id bigint, ts_us bigint, user_id bigint,"
    " event_type string, value double, props string"
)


def read_events_json(spark, sf_dir: str):
    """JSON Lines source with an EXPLICIT schema (schema inference over
    100 TB is a full extra scan — never rely on it) + FAILFAST so corrupt
    rows surface loudly instead of nulling out silently."""
    from pyspark.sql import functions as F

    path = ensure_format_copies(sf_dir)["events_jsonl"]
    df = (
        spark.read.schema(EVENTS_COPY_SCHEMA)
        .option("mode", "FAILFAST")
        .json(path)
    )
    return df.withColumn("ts", F.timestamp_micros(F.col("ts_us"))).drop("ts_us")


def read_events_orc(spark, sf_dir: str):
    """ORC source — columnar scan with the same pushdown story as
    parquet (PushedFilters shows up in the ORC scan node too)."""
    from pyspark.sql import functions as F

    path = ensure_format_copies(sf_dir)["events_orc"]
    df = spark.read.orc(path)
    return df.withColumn("ts", F.timestamp_micros(F.col("ts_us"))).drop("ts_us")
