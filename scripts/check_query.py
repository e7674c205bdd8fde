"""Targeted oracle check for named registry queries — same comparison
as scripts/drive_entry.py but only for the names given on argv.

Usage: python scripts/check_query.py [--sf SF_DIR] name [name ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402

args = sys.argv[1:]
SF_DIR = "/root/testdata/sf0.01"
if args and args[0] == "--sf":
    SF_DIR = args[1]
    args = args[2:]
names = args

spark = (
    SparkSession.builder.master("local[8]")
    .appName("check-query")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

qs = E.queries()
oracles = E.oracle_sql()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def sortkey(t):
    return tuple((v is None, str(type(v)), str(v)) for v in t)


fail = 0
for name in names:
    if name not in qs:
        print(f"FAIL {name}: not in registry")
        fail += 1
        continue
    t0 = time.time()
    sdf = qs[name](spark, SF_DIR)
    scols = sorted(sdf.columns)
    srows = sorted(
        (tuple(norm(v) for v in r) for r in sdf.select(*scols).collect()),
        key=sortkey,
    )
    el = time.time() - t0
    if name not in oracles:
        print(f"ok   {name}: {len(srows)} rows (rows-only) {el:.1f}s")
        continue
    cur = con.execute(oracles[name])
    dcols = [d[0] for d in cur.description]
    order = sorted(range(len(dcols)), key=lambda i: dcols[i])
    drows = sorted(
        (tuple(norm(r[i]) for i in order) for r in cur.fetchall()),
        key=sortkey,
    )
    if sorted(dcols) != scols:
        print(f"FAIL {name}: cols spark={scols} duck={sorted(dcols)}")
        fail += 1
    elif srows != drows:
        diff = next(
            (i for i, (a, b) in enumerate(zip(srows, drows)) if a != b),
            None,
        )
        print(f"FAIL {name}: {len(srows)} vs {len(drows)} rows, diff idx {diff}")
        if diff is not None:
            print("   spark:", srows[diff])
            print("   duck :", drows[diff])
        fail += 1
    else:
        print(f"ok   {name}: {len(srows)} rows hash-match {el:.1f}s")

sys.exit(1 if fail else 0)
