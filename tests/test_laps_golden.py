"""Golden end-to-end regression for the four flagship laps pipelines.

The operator-level semantics are pinned by ``test_laps_semantics.py`` on a
13-row inline table; this module closes the pipeline-level gap
(VERDICT round 1, "What's missing" §2): a season-scale deterministic laps
parquet fixture (``laps_fixture.py``) is written to disk, read back through
a real parquet scan, run through the complete pipelines of
``laps_analytics.py``, and compared against an INDEPENDENT pure-Python
recomputation of every value (mean/std-pop/OLS-slope/dense-rank/median by
hand over the raw rows — no Spark, no pandas float64 NULL/NaN collapse).

A few literal golden values are additionally pinned so a silent generator
change cannot re-derive both sides into agreeing wrongness.
"""

from __future__ import annotations

import math
import statistics
from collections import defaultdict

import pytest

from f1_bigdata_pyspark_spark import laps_analytics as LA
from tests.laps_fixture import build_laps_rows, write_laps_parquet

APPROX = dict(rel=1e-9, abs=1e-9)


def _present(v) -> bool:
    """The reference's dual missing test, Python-side."""
    return v is not None and not (isinstance(v, float) and math.isnan(v))


def _missing(v) -> bool:
    return not _present(v)


ROWS = build_laps_rows()
COL = {
    name: i
    for i, name in enumerate(
        [
            "Driver", "Team", "LapNumber", "Stint", "Compound", "TyreLife",
            "LapTime", "Sector1Time", "Sector2Time", "Sector3Time",
            "PitInTime", "PitOutTime", "IsAccurate", "TrackStatus",
            "Year", "GrandPrix", "Session", "IngestedAt",
        ]
    )
}


def _clean_rows() -> list[tuple]:
    out = []
    for r in ROWS:
        if not _present(r[COL["LapTime"]]):
            continue
        if not r[COL["IsAccurate"]]:
            continue
        if _present(r[COL["PitInTime"]]) or _present(r[COL["PitOutTime"]]):
            continue
        if r[COL["Session"]] != "R":
            continue
        if r[COL["Driver"]] is None or r[COL["GrandPrix"]] is None:
            continue
        out.append(r)
    return out


def _pop_std(xs: list[float]) -> float:
    m = sum(xs) / len(xs)
    return math.sqrt(sum((x - m) ** 2 for x in xs) / len(xs))


def _dense_rank(values: list[float]) -> dict[float, int]:
    return {v: i + 1 for i, v in enumerate(sorted(set(values)))}


@pytest.fixture(scope="module")
def laps(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("laps_fixture") / "laps.parquet")
    write_laps_parquet(spark, path)
    return spark.read.parquet(path)


def test_fixture_shape_golden(laps):
    # pinned literals: fixture size and missing-value counts (seeded rng)
    assert len(ROWS) == 6184
    assert laps.count() == 6184
    from pyspark.sql import functions as F

    nulls = laps.filter(F.col("LapTime").isNull()).count()
    nans = laps.filter(F.isnan("LapTime")).count()
    assert nulls == 126  # SQL NULL survived the parquet round-trip
    assert nans == 127  # distinct from NaN
    assert nulls == sum(1 for r in ROWS if r[COL["LapTime"]] is None)
    assert nans == sum(
        1
        for r in ROWS
        if isinstance(r[COL["LapTime"]], float) and math.isnan(r[COL["LapTime"]])
    )


def test_avg_laptime_by_driver_golden(laps):
    # Q1a (mongo_avg_laptime_by_driver.py): only LapTime/Driver filters
    got = {
        r["Driver"]: (r["n_laps"], r["avg_lap_s"])
        for r in LA.avg_laptime_by_driver(laps).collect()
    }
    by_driver = defaultdict(list)
    for r in ROWS:
        if _present(r[COL["LapTime"]]) and r[COL["Driver"]] is not None:
            by_driver[r[COL["Driver"]]].append(r[COL["LapTime"]])
    assert set(got) == set(by_driver)
    for d, xs in by_driver.items():
        assert got[d][0] == len(xs)
        assert got[d][1] == pytest.approx(sum(xs) / len(xs), **APPROX)


def test_lap_weighted_metrics_golden(laps):
    # Q2 view A: clean stack + HAVING n_laps >= 100
    clean = LA.clean_laps(laps)
    got = {
        r["Driver"]: r for r in LA.lap_weighted_metrics(clean).collect()
    }
    by_driver = defaultdict(list)
    for r in _clean_rows():
        by_driver[r[COL["Driver"]]].append(r[COL["LapTime"]])
    want = {d: xs for d, xs in by_driver.items() if len(xs) >= 100}
    assert set(got) == set(want)
    # LAW (1 race) is below the 100-lap threshold; DEV (4 races) passes it
    # here but is dropped later by races_present >= 8 — the two thresholds
    # bite different drivers, like the reference's real season data.
    assert "LAW" not in got and "DEV" in got
    for d, xs in want.items():
        assert got[d]["n_laps"] == len(xs)
        assert got[d]["avg_lap_s"] == pytest.approx(sum(xs) / len(xs), **APPROX)
        assert got[d]["std_lap_s"] == pytest.approx(_pop_std(xs), **APPROX)


def test_race_normalized_metrics_golden(laps):
    # Q2 view B: two-level equal-weight-per-race aggregation with both
    # HAVING thresholds
    clean = LA.clean_laps(laps)
    got = {
        r["Driver"]: r for r in LA.race_normalized_metrics(clean).collect()
    }
    per_race = defaultdict(list)
    for r in _clean_rows():
        per_race[(r[COL["Driver"]], r[COL["GrandPrix"]])].append(r[COL["LapTime"]])
    per_driver = defaultdict(list)
    for (d, _gp), xs in per_race.items():
        if len(xs) >= 10:
            per_driver[d].append((sum(xs) / len(xs), _pop_std(xs)))
    want = {d: rs for d, rs in per_driver.items() if len(rs) >= 8}
    assert set(got) == set(want)
    # partial-season drivers (4 and 5 races) dropped by races_present >= 8
    assert "DEV" not in got and "LAW" not in got
    for d, rs in want.items():
        assert got[d]["races_present"] == len(rs)
        assert got[d]["avg_lap_s_equal_races"] == pytest.approx(
            sum(a for a, _ in rs) / len(rs), **APPROX
        )
        assert got[d]["std_lap_s_equal_races"] == pytest.approx(
            sum(s for _, s in rs) / len(rs), **APPROX
        )


def test_pareto_table_golden(laps):
    # Q2 combined: dense ranks + rank_sum + tiebreaker sort
    clean = LA.clean_laps(laps)
    lw = LA.lap_weighted_metrics(clean)
    got = LA.pareto_table(lw, "avg_lap_s", "std_lap_s", top_n=15).collect()

    metrics = {r["Driver"]: (r["avg_lap_s"], r["std_lap_s"]) for r in lw.collect()}
    rank_speed = _dense_rank([a for a, _ in metrics.values()])
    rank_cons = _dense_rank([s for _, s in metrics.values()])
    want = sorted(
        (
            (
                rank_speed[a] + rank_cons[s], a, s, d,
            )
            for d, (a, s) in metrics.items()
        ),
    )[:15]
    assert [r["Driver"] for r in got] == [d for *_, d in want]
    for r, (rs, a, s, _d) in zip(got, want):
        assert r["rank_sum"] == rs
        assert r["avg_lap_s"] == pytest.approx(a, **APPROX)


def test_tyre_degradation_golden(laps):
    # Q3: per-stint OLS slope from sufficient statistics
    got_rows = LA.tyre_degradation_by_stint(laps).collect()
    got = {
        (r["GrandPrix"], r["Driver"], r["Stint"], r["Compound"]): r
        for r in got_rows
    }
    groups = defaultdict(list)
    for r in ROWS:
        if not _present(r[COL["LapTime"]]):
            continue
        if not _present(r[COL["TyreLife"]]):
            continue
        if r[COL["Stint"]] is None or r[COL["Driver"]] is None:
            continue
        if r[COL["GrandPrix"]] is None:
            continue
        if r[COL["Compound"]] not in ("SOFT", "MEDIUM", "HARD"):
            continue
        if not r[COL["IsAccurate"]]:
            continue
        if _present(r[COL["PitInTime"]]) or _present(r[COL["PitOutTime"]]):
            continue
        if r[COL["TyreLife"]] < 2:
            continue
        key = (r[COL["GrandPrix"]], r[COL["Driver"]], r[COL["Stint"]],
               r[COL["Compound"]])
        groups[key].append((r[COL["TyreLife"]], r[COL["LapTime"]]))
    want = {}
    for key, xy in groups.items():
        if len(xy) < 8:
            continue
        n = len(xy)
        xm = sum(x for x, _ in xy) / n
        ym = sum(y for _, y in xy) / n
        xym = sum(x * y for x, y in xy) / n
        x2m = sum(x * x for x, _ in xy) / n
        var_x = x2m - xm * xm
        slope = None if var_x == 0 else (xym - xm * ym) / var_x
        want[key] = (n, slope)
    assert set(got) == set(want)
    for key, (n, slope) in want.items():
        assert got[key]["n_laps"] == n
        if slope is None:
            assert got[key]["deg_ms_per_tyre_lap"] is None
        else:
            assert got[key]["deg_ms_per_tyre_lap"] == pytest.approx(
                slope * 1000.0, **APPROX
            )
    # the constant-TyreLife stint survives the HAVING and has a NULL slope
    ver_const = [
        k for k, (_n, s) in want.items()
        if k[0] == "GP00 Grand Prix" and k[1] == "VER" and k[2] == 3.0
    ]
    assert ver_const and want[ver_const[0]][1] is None
    # result is sorted by slope desc (NULLs last per Spark desc ordering)
    slopes = [
        r["deg_ms_per_tyre_lap"]
        for r in got_rows
        if r["deg_ms_per_tyre_lap"] is not None
    ]
    assert slopes == sorted(slopes, reverse=True)


def test_compound_summary_golden(laps):
    # Q3 rollup (notebook cell 32): count/mean/median per compound
    deg = LA.tyre_degradation_by_stint(laps)
    got = {r["Compound"]: r for r in LA.compound_summary(deg).collect()}
    slopes_ms = defaultdict(list)
    for r in LA.tyre_degradation_by_stint(laps).collect():
        if r["deg_ms_per_tyre_lap"] is not None:
            slopes_ms[r["Compound"]].append(r["deg_ms_per_tyre_lap"])
    assert set(got) == set(slopes_ms)
    for comp, xs in slopes_ms.items():
        assert got[comp]["n_stints"] == len(xs)
        assert got[comp]["mean_deg_ms"] == pytest.approx(
            sum(xs) / len(xs), **APPROX
        )
        assert got[comp]["median_deg_ms"] == pytest.approx(
            statistics.median(xs), **APPROX
        )


def test_ingest_upsert_dedups_golden(spark, laps):
    """FIXTURES.md laps_with_dups: re-ingest ~1% of rows with a LATER
    IngestedAt and changed LapTime through the keep-latest upsert — the
    merged table keeps exactly one row per lap key, with the re-ingested
    rows winning."""
    from pyspark.sql import functions as F

    from f1_bigdata_pyspark_spark.sources.laps_ingest import (
        LAP_KEY,
        ingest_lap_batch,
    )

    dup_batch = (
        laps.filter(F.col("LapNumber") == 7.0)  # one lap per driver-race ≈ 2%
        .withColumn("IngestedAt", F.lit("2023-12-02T00:00:00Z"))
        .withColumn("LapTime", F.col("LapTime") + F.lit(1000.0))
    )
    n_dups = dup_batch.count()
    assert n_dups > 0
    merged = ingest_lap_batch(laps, dup_batch)
    # unique key holds and no rows were lost or invented
    assert merged.count() == laps.count()
    assert merged.groupBy(*LAP_KEY).count().filter("count > 1").count() == 0
    # every re-ingested key carries the NEW IngestedAt and shifted LapTime
    winners = merged.filter(F.col("IngestedAt") == "2023-12-02T00:00:00Z")
    assert winners.count() == n_dups
    assert winners.filter(F.col("LapTime") < 1000.0).count() == 0
