"""Products CSV source — reference ``products_import.py`` re-expressed.

The reference bulk-loads a 7-column CSV into Postgres with a manual header
skip and positional COPY (``products_import.py:18-20``). Spark's CSV reader
does header handling, explicit schema, and parallel splits natively; the
"load" is just a read + optional write to a parquet table (S1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema implied by the reference CSV header (data/dummy-products.csv:1)
# and the COPY column list (products_import.py:20).
PRODUCTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("img_url", T.StringType(), True),
        T.StructField("color", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
    ]
)


def read_products_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: header-aware, schema-declared CSV scan (no inference pass)."""
    return spark.read.csv(path, header=True, schema=PRODUCTS_SCHEMA)


def product_content(df: DataFrame) -> DataFrame:
    """P2: the retrieval-document template projection — the f-string at
    ``rag.py:48`` as a columnar format_string."""
    return df.withColumn(
        "content",
        F.format_string(
            "%s, category: %s, color: %s, price: %s$, image: %s, description: %s",
            F.col("name"),
            F.col("category"),
            F.col("color"),
            F.col("price").cast("string"),
            F.col("img_url"),
            F.col("description"),
        ),
    )
