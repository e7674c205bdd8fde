"""Drive the driver contract the way the driver does: vanilla SparkSession
(no engine-side configs), import __spark_entry__, run entry() + every
queries() entry against its oracle_sql() in DuckDB at sf0.01.

Usage: python scripts/drive_entry.py [sf_dir]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# Deliberately vanilla: the driver owns this session, not the engine.
spark = (
    SparkSession.builder.master("local[8]").appName("drive-entry").getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

t0 = time.time()
flag = E.entry(spark)
rows = flag.collect()
print(f"entry(): {len(rows)} rows in {time.time() - t0:.1f}s schema={flag.columns}")
for r in rows[:3]:
    print("   ", tuple(r)[:3])
assert len(rows) > 0, "entry() must return rows"

con = duckdb.connect()
for name in (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split():
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'")

qs = E.queries()
oracles = E.oracle_sql()
extra = set(oracles) - set(qs)
assert not extra, f"oracle_sql keys not in queries: {extra}"


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def sortkey(t):
    return tuple((v is None, str(type(v)), str(v)) for v in t)


fail = 0
for name, fn in sorted(qs.items()):
    t0 = time.time()
    try:
        sdf = fn(spark, SF_DIR)
        scols = sorted(sdf.columns)
        srows = sorted(
            (tuple(norm(v) for v in r) for r in sdf.select(*scols).collect()),
            key=sortkey,
        )
    except Exception as ex:
        print(f"FAIL {name}: spark error {type(ex).__name__}: {str(ex)[:200]}")
        fail += 1
        continue
    if name not in oracles:
        print(f"ok   {name}: {len(srows)} rows (rows-only, no oracle) {time.time()-t0:.1f}s")
        continue
    try:
        cur = con.execute(oracles[name])
        dcols = [d[0] for d in cur.description]
        order = sorted(range(len(dcols)), key=lambda i: dcols[i])
        drows = sorted(
            (tuple(norm(r[i]) for i in order) for r in cur.fetchall()), key=sortkey
        )
    except Exception as ex:
        print(f"FAIL {name}: duckdb error {str(ex)[:200]}")
        fail += 1
        continue
    if sorted(dcols) != scols:
        print(f"FAIL {name}: cols spark={scols} duck={sorted(dcols)}")
        fail += 1
    elif srows != drows:
        diff = next(
            (i for i, (a, b) in enumerate(zip(srows, drows)) if a != b), None
        )
        print(
            f"FAIL {name}: {len(srows)} vs {len(drows)} rows; first diff idx {diff}:"
        )
        if diff is not None:
            print("   spark:", srows[diff])
            print("   duck :", drows[diff])
        fail += 1
    else:
        print(f"ok   {name}: {len(srows)} rows hash-match {time.time()-t0:.1f}s")

print(f"\n{'ALL OK' if fail == 0 else f'{fail} FAILURES'} / {len(qs)} queries")
sys.exit(1 if fail else 0)
