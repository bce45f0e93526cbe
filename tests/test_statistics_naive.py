"""Independent numpy pins for the statistical faces.

The DuckDB oracles prove Spark and SQL state the same computation; these
tests prove the computation IS the textbook statistic, by recomputing with
numpy on the raw parquet (loose tolerance absorbs the faces' documented
quantization, so a shared-formula bug on both engine sides cannot hide —
the triangle-undercount lesson applied to the stats family).
"""

from __future__ import annotations

import duckdb
import math

import numpy as np

from f1_bigdata_pyspark_spark.queries.registry import get_query

from tests.conftest import SF_SMOKE


def _events():
    con = duckdb.connect()
    return con.sql(
        f"SELECT event_type, CAST(ts AS DATE) AS d, ts, value "
        f"FROM '{SF_SMOKE}/events.parquet'"
    ).fetchall()


def test_moments_match_numpy(spark):
    """Raw-power-sum skewness/kurtosis == numpy's moment definitions on the
    1e-1-quantized values (the face's stated domain)."""
    rows = _events()
    byt: dict[str, list[float]] = {}
    for et, _d, _ts, v in rows:
        if v is not None:
            byt.setdefault(et, []).append(math.floor(v * 10 + 0.5))
    got = {
        r["event_type"]: r
        for r in get_query("value_moments_profile").fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(byt)
    for et, vals in byt.items():
        x = np.asarray(vals, dtype=np.float64)
        m2 = x.var()  # population
        m3 = ((x - x.mean()) ** 3).mean()
        m4 = ((x - x.mean()) ** 4).mean()
        assert abs(got[et]["mean_value"] - x.mean() / 10.0) < 1e-4
        assert abs(got[et]["var_pop"] - m2 / 100.0) < 1e-3
        assert abs(got[et]["skewness"] - m3 / m2**1.5) < 1e-4
        assert abs(got[et]["excess_kurtosis"] - (m4 / m2**2 - 3.0)) < 1e-4


def test_anova_matches_manual_f(spark):
    """Sufficient-stats one-way ANOVA == the partitioned sum-of-squares
    definition on the 1e-3-quantized values."""
    rows = _events()
    byt: dict[str, list[float]] = {}
    for et, _d, _ts, v in rows:
        if v is not None:
            byt.setdefault(et, []).append(math.floor(v * 1000 + 0.5))
    groups = [np.asarray(v, dtype=np.float64) for v in byt.values()]
    allx = np.concatenate(groups)
    k, n = len(groups), len(allx)
    ssb = sum(len(g) * (g.mean() - allx.mean()) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f_expected = (ssb / (k - 1)) / (ssw / (n - k))
    row = get_query("value_anova_event_types").fn(spark, SF_SMOKE).collect()[0]
    assert row["n_groups"] == k and row["n_obs"] == n
    assert abs(row["f_stat"] - f_expected) / f_expected < 1e-4


def test_acf_matches_numpy(spark):
    """Day-grid ACF == the centered-product definition on the quantized
    day-mean series (tolerance absorbs the integer-floor centering)."""
    rows = _events()
    day: dict[object, list[float]] = {}
    for _et, d, _ts, v in rows:
        if v is not None:
            day.setdefault(d, []).append(v)
    days = sorted(day)
    m = np.asarray([np.mean(day[d]) for d in days])
    c = m - m.mean()
    got = {
        r["lag"]: r["acf"]
        for r in get_query("daily_value_acf").fn(spark, SF_SMOKE).collect()
    }
    denom = (c * c).sum()
    for k in range(1, 8):
        expected = (c[:-k] * c[k:]).sum() / denom
        assert abs(got[k] - expected) < 5e-3, (k, got[k], expected)


def test_fano_matches_numpy(spark):
    """Fano factor == var/mean of the daily count series."""
    rows = _events()
    cnt: dict[tuple, int] = {}
    for et, d, _ts, _v in rows:
        cnt[(et, d)] = cnt.get((et, d), 0) + 1
    byt: dict[str, list[int]] = {}
    for (et, _d), n in cnt.items():
        byt.setdefault(et, []).append(n)
    got = {
        r["event_type"]: r
        for r in get_query("event_type_fano_burstiness")
        .fn(spark, SF_SMOKE)
        .collect()
    }
    for et, counts in byt.items():
        x = np.asarray(counts, dtype=np.float64)
        assert got[et]["n_days"] == len(counts)
        assert abs(got[et]["fano"] - x.var() / x.mean()) < 1e-4
