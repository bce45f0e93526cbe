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
    # zero-norm guard (matches functions/vectors.cosine, which returns
    # NULL): a zero vector or zero centroid would divide by zero and
    # poison every stat with NaN — exclude those rows like SQL excludes
    # NULLs from aggregates
    denom = norms * cnorm
    valid = denom > 0
    if not valid.any():
        cos = np.array([np.nan])
    else:
        cos = (mat @ centroid)[valid] / denom[valid]
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


# --------------------------------------------------------------------------
# Cogrouped-map: the one Arrow Python tier not covered by applyInPandas /
# mapInPandas / mapInArrow / UDTF — TWO DataFrames grouped on the same key,
# each key's pair of groups delivered to one Python call
# (``a.groupBy(k).cogroup(b.groupBy(k)).applyInPandas``). The canonical use
# is per-entity reconciliation of two event streams where the logic needs
# both sides at once (sequence alignment, per-user attribution).
# Scale: one shuffle per side on the key (the same exchange a join would
# pay), groups pair-aligned by the cogroup exec; each PAIR of groups must
# fit in one worker's memory. When the per-group logic is relational
# (as in the attribution example below), the join form is cheaper — this
# tier exists for logic that isn't.
# --------------------------------------------------------------------------

ATTRIBUTION_SCHEMA = (
    "user_id long, n_purchases long, n_clicks long, "
    "purchase_value double, n_after_last_click long"
)


def _attribution(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    # left = one user's purchases (user_id, ts, value); right = the same
    # user's clicks (user_id, ts). Either side may be empty (cogroup is
    # full-outer on keys).
    uid = left["user_id"].iloc[0] if len(left) else right["user_id"].iloc[0]
    n_p, n_c = len(left), len(right)
    pv = round(float(left["value"].sum()), 4) if n_p else 0.0
    if n_c:
        last_click = right["ts"].max()
        n_after = int((left["ts"] > last_click).sum()) if n_p else 0
    else:
        n_after = n_p  # no clicks: every purchase is past the "last click"
    return pd.DataFrame(
        {
            "user_id": [uid],
            "n_purchases": [n_p],
            "n_clicks": [n_c],
            "purchase_value": [pv],
            "n_after_last_click": [n_after],
        }
    )


def cogroup_attribution(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """Per-user purchase/click reconciliation via cogrouped applyInPandas.
    purchases: (user_id, ts, value); clicks: (user_id, ts)."""
    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(_attribution, schema=ATTRIBUTION_SCHEMA)
    )
