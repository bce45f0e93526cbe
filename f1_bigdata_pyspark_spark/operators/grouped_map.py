"""Grouped-map custom operator via ``applyInPandas`` (Arrow-batched).

The escape hatch for per-group algorithms the built-in aggregates can't
express — here, per-label embedding-cluster cohesion: the group's centroid
and every member's cosine to it, computed vectorized in numpy over one Arrow
batch per group.

Scale notes: one shuffle on the grouping key; each group must fit in one
worker's memory (fine for label-sized groups; for giant groups you'd
pre-aggregate sufficient statistics relationally instead — sum vector +
count give the centroid without a grouped map). Compare
``functions/vectors.cosine`` for the pure-SQL per-row path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

COHESION_SCHEMA = (
    "label int, n_vectors long, mean_cos double, min_cos double, p10_cos double"
)


def _cohesion(pdf: pd.DataFrame) -> pd.DataFrame:
    # float64 BEFORE any arithmetic: the Arrow batch delivers float32
    # arrays, and float32 centroid math drifts ~1e-7 from a double-precision
    # oracle — enough to flip a 6-dp rounding.
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)  # (n, dim)
    centroid = mat.mean(axis=0)
    cnorm = np.linalg.norm(centroid)
    norms = np.linalg.norm(mat, axis=1)
    cos = mat @ centroid / (norms * cnorm)
    return pd.DataFrame(
        {
            "label": [pdf["label"].iloc[0]],
            "n_vectors": [len(pdf)],
            "mean_cos": [round(float(cos.mean()), 6)],
            "min_cos": [round(float(cos.min()), 6)],
            "p10_cos": [round(float(np.quantile(cos, 0.1)), 6)],
        }
    )


def label_cohesion(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid cohesion stats. Columns: label, n_vectors,
    mean_cos, min_cos, p10_cos."""
    return embeddings.groupBy("label").applyInPandas(
        _cohesion, schema=COHESION_SCHEMA
    )
