"""Grouped-map centroid computation via applyInPandas.

Completes the Python-lane API matrix (pandas_udf: embedder; mapInPandas:
multimodal; applyInPandasWithState: streaming profiles; UDTF: chunking;
and here applyInPandas): per-group vector aggregation where each group's
vectors land in one Arrow batch — the kmeans-assignment/centroid-update
step of IVF index maintenance.

The relational-explode equivalent (plans/vector.py::label_centroid_norm)
is the pure-SQL twin; this one keeps the group's vectors as a numpy matrix
(one BLAS reduction instead of a 64-way shuffle), the better shape when
dim is large. Rows within a group are sorted by id before reduction so the
float sum order — and therefore the oracle hash — is deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = "label int, centroid array<double>, n_vectors bigint"


def _centroid_of_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("vec_id")  # deterministic fold order
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    return pd.DataFrame(
        {
            "label": [int(pdf["label"].iloc[0])],
            "centroid": [mat.mean(axis=0)],
            "n_vectors": [len(pdf)],
        }
    )


def label_centroids(emb: DataFrame) -> DataFrame:
    """(vec_id, embedding, label) -> one centroid row per label."""
    return emb.select("vec_id", "embedding", "label").groupBy("label").applyInPandas(
        _centroid_of_group, schema=OUT_SCHEMA
    )


def label_centroids_arrow(emb: DataFrame) -> DataFrame:
    """The SAME per-label centroid as label_centroids, through Spark 4's
    grouped ``applyInArrow`` — the zero-pandas lane: each group arrives
    as a ``pyarrow.Table``, the vector column is flattened straight out
    of the Arrow FixedSizeList/List buffer into one numpy matrix, and
    the result goes back as an Arrow table. No pandas object boxing on
    either side, which is the right call when the payload is numeric
    arrays (pandas would materialize a python list per row).

    Rows sort by vec_id before the fold, so the float sum order — and
    the DuckDB oracle hash — matches the applyInPandas twin exactly.
    """
    import pyarrow as pa

    def _centroid_of_group_arrow(tbl: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(tbl["vec_id"])
        tbl = tbl.take(idx)
        col = tbl["embedding"].combine_chunks()
        # list<float> -> (n, dim) float64 matrix via the flat values buffer
        n = len(col)
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = flat.reshape(n, -1)
        label = int(tbl["label"][0].as_py())
        return pa.table(
            {
                "label": pa.array([label], pa.int32()),
                "centroid": pa.array(
                    [mat.mean(axis=0).tolist()], pa.list_(pa.float64())
                ),
                "n_vectors": pa.array([n], pa.int64()),
            }
        )

    return (
        emb.select("vec_id", "embedding", "label")
        .groupBy("label")
        .applyInArrow(_centroid_of_group_arrow, schema=OUT_SCHEMA)
    )
