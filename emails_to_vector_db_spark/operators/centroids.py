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
