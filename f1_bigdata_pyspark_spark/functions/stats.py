"""Per-group statistics expressed as sufficient-statistic aggregates.

The reference computes a per-stint OLS slope from sufficient statistics —
``cov(x,y)/var(x)`` with ``cov = avg(x*y) - avg(x)*avg(y)`` and
``var = avg(x^2) - avg(x)^2``, guarding division by zero with
``when(var == 0, NULL)`` (reference: ``src/processing/
tyre_degradation_by_stint.py:54-79``). That formula is the spec; we keep it
(so the DuckDB oracle can state the identical arithmetic) and additionally
expose Spark's built-in ``regr_slope`` which must agree.

Scale notes: sufficient statistics are classic map-side-combinable aggregates
— a 100 TB groupBy computes partial avg/sum per partition and merges, one
shuffle total. No window, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def slope_sufficient_stats(x: Column, y: Column) -> dict[str, Column]:
    """Aggregate expressions for a per-group OLS slope of y on x.

    Returns the dict of named aggregate Columns; compose into ``.agg(**)`` or
    ``.agg(*exprs.values())``. All inputs cast to double (reference casts at
    ``tyre_degradation_by_stint.py:54-55``).
    """
    xd = x.cast("double")
    yd = y.cast("double")
    return {
        "n_rows": F.count(F.lit(1)).alias("n_rows"),
        "avg_x": F.avg(xd).alias("avg_x"),
        "avg_y": F.avg(yd).alias("avg_y"),
        "avg_xy": F.avg(xd * yd).alias("avg_xy"),
        "avg_xx": F.avg(xd * xd).alias("avg_xx"),
    }


def slope_from_stats(
    avg_x: Column, avg_y: Column, avg_xy: Column, avg_xx: Column
) -> Column:
    """cov/var slope with the reference's guarded division
    (``tyre_degradation_by_stint.py:73-78``): var==0 → NULL, not error/inf."""
    cov = avg_xy - avg_x * avg_y
    var = avg_xx - avg_x * avg_x
    return F.when(var == F.lit(0.0), F.lit(None).cast("double")).otherwise(cov / var)


def stddev_pop(c: Column) -> Column:
    """Population std — the reference deliberately uses stddev_pop, not the
    sample default (``fastest_vs_most_consistent_drivers.py:102``)."""
    return F.stddev_pop(c.cast("double"))
