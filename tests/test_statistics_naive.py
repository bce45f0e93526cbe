"""Independent numpy pins for the statistical faces.

The DuckDB oracles prove Spark and SQL state the same computation; these
tests prove the computation IS the textbook statistic, by recomputing with
numpy on the raw parquet (loose tolerance absorbs the faces' documented
quantization, so a shared-formula bug on both engine sides cannot hide —
the triangle-undercount lesson applied to the stats family).
"""

from __future__ import annotations

import duckdb
import pytest
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


def test_dunning_g2_hand_case(spark):
    """The G² expression used by dunning_g2_collocations equals the
    textbook four-cell log-likelihood ratio on a hand-computed 2×2."""
    # contingency: k11=10 joint, row total r=40, col total c=30, N=1000
    k11, r, c, n = 10.0, 40.0, 30.0, 1000.0
    k12, k21 = r - k11, c - k11
    k22 = n - r - c + k11

    def ll(k, total_row, total_col):
        e = total_row * total_col / n
        return k * math.log(k / e) if k > 0 else 0.0

    g2_textbook = 2.0 * (
        ll(k11, r, c)
        + ll(k12, r, n - c)
        + ll(k21, n - r, c)
        + ll(k22, n - r, n - c)
    )
    # the face's ratio-of-ratios form (overflow-safe at corpus scale)
    g2_face = 2.0 * (
        k11 * math.log((k11 / r) * (n / c))
        + k12 * math.log((k12 / r) * (n / (n - c)))
        + k21 * math.log((k21 / (n - r)) * (n / c))
        + k22 * math.log((k22 / (n - r)) * (n / (n - c)))
    )
    assert abs(g2_face - g2_textbook) < 1e-9


def test_benford_expected_shares_sum_to_one(spark):
    """The Benford face's observed shares and expectations are coherent:
    shares sum to 1, expectations sum to 1, chi2 terms non-negative."""
    rows = get_query("benford_first_digit").fn(spark, SF_SMOKE).collect()
    assert {r["digit"] for r in rows} <= set("123456789")
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-4
    benford_total = sum(
        math.log10(1 + 1 / d) for d in range(1, 10)
    )
    assert abs(benford_total - 1.0) < 1e-12
    assert all(r["chi2_term"] >= 0 for r in rows)
    # expectations on rows match the law
    for r in rows:
        d = int(r["digit"])
        assert abs(r["benford_p"] - round(math.log10(1 + 1 / d), 6)) < 1e-9


def test_kmeans_training_rounds_matches_numpy(spark, sf_smoke):
    """Independent numpy replay of the 3-round Lloyd trajectory: same
    first-16 seed, same rounded-cosine + centroid-id tiebreak, same
    element-wise mean update — catches a shared Spark/oracle slip in the
    unrolled round plumbing (the triangle-undercount lesson applied to the
    training loop)."""
    import duckdb
    import numpy as np

    from f1_bigdata_pyspark_spark.queries.registry import get_query

    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_smoke}/embeddings.parquet') ORDER BY vec_id"
    ).df()
    ids = emb["vec_id"].to_numpy()
    V = np.array([np.array(v, dtype=float) for v in emb["embedding"]])
    cent_ids = ids[ids < 16]
    C = V[ids < 16].copy()

    def assign(C, cids):
        # rounded cosine, centroid-id tiebreak (argmax keeps FIRST max —
        # centroids are already in ascending cid order)
        cos = (V @ C.T) / (
            np.linalg.norm(V, axis=1)[:, None] * np.linalg.norm(C, axis=1)[None, :]
        )
        cos = np.round(cos, 6)
        best = cos.argmax(axis=1)
        return cids[best], cos[np.arange(len(V)), best]

    want = []
    for r in (1, 2, 3):
        a, cs = assign(C, cent_ids)
        want.append((r, len(V), len(set(a)), round(float(cs.mean()), 6)))
        if r < 3:
            alive = sorted(set(a))
            C = np.array([V[a == c].mean(axis=0) for c in alive])
            cent_ids = np.array(alive)

    got = [
        (row.round, row.n_vecs, row.n_cells, row.avg_cos)
        for row in get_query("kmeans_training_rounds").fn(spark, sf_smoke).collect()
    ]
    assert got == [
        (r, n, c, pytest.approx(a, abs=2e-6)) for r, n, c, a in want
    ]
