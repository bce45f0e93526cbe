"""Deterministic laps-table fixture generator (FIXTURES.md §1).

Synthesizes a 2023-season-shaped laps table with every semantic the
reference's analytics depend on:

- both SQL NULL and float NaN missing values in double columns
- pit laps (PitInTime/PitOutTime set, mixed null/NaN encodings on non-pit)
- IsAccurate=false rows, INTERMEDIATE/WET compounds, TyreLife=1 rows —
  each excluded by a specific reference filter
- group sizes straddling every HAVING threshold (n_laps ≥ 100 per driver,
  laps_in_race ≥ 10, races_present ≥ 8, n_laps ≥ 8 per stint)
- one long stint with CONSTANT TyreLife (var_x == 0 → guarded division →
  NULL slope)
- per-stint LapTime = base + slope·TyreLife + bounded noise, so the
  recovered OLS slope is meaningful

Pure numpy with a fixed seed: the same table every run, so golden values
pinned in tests stay valid.
"""

from __future__ import annotations

import numpy as np

SEED = 20230413
YEAR = 2023
SESSION = "R"
N_EVENTS = 10
EVENTS = [f"GP{i:02d} Grand Prix" for i in range(N_EVENTS)]
DRIVERS = [
    "VER", "HAM", "LEC", "NOR", "ALO", "RUS", "SAI", "PIA",
    "GAS", "OCO", "STR", "TSU",
    # partial-season drivers: present in <8 events → dropped by the
    # races_present ≥ 8 HAVING in race_normalized_metrics
    "DEV", "LAW",
]
# DEV: 4 races (~160 clean laps — passes n_laps ≥ 100, fails races ≥ 8);
# LAW: 1 race (~45 clean laps — fails BOTH thresholds). Together they
# straddle every coverage HAVING (FIXTURES.md "critical generator reqs").
PARTIAL = {"DEV": EVENTS[:4], "LAW": EVENTS[4:5]}
COMPOUNDS = ["SOFT", "MEDIUM", "HARD"]
INGESTED_AT = "2023-12-01T00:00:00Z"

COLUMNS = [
    "Driver", "Team", "LapNumber", "Stint", "Compound", "TyreLife",
    "LapTime", "Sector1Time", "Sector2Time", "Sector3Time",
    "PitInTime", "PitOutTime", "IsAccurate", "TrackStatus",
    "Year", "GrandPrix", "Session", "IngestedAt",
]

SPARK_SCHEMA = (
    "Driver string, Team string, LapNumber double, Stint double, "
    "Compound string, TyreLife double, LapTime double, "
    "Sector1Time double, Sector2Time double, Sector3Time double, "
    "PitInTime double, PitOutTime double, IsAccurate boolean, "
    "TrackStatus string, Year int, GrandPrix string, Session string, "
    "IngestedAt string"
)


def build_laps_rows() -> list[tuple]:
    rng = np.random.default_rng(SEED)
    nan = float("nan")
    rows: list[tuple] = []
    for ei, event in enumerate(EVENTS):
        event_offset = float(ei)  # track speed differs per event
        for di, driver in enumerate(DRIVERS):
            if driver in PARTIAL and event not in PARTIAL[driver]:
                continue
            base = 80.0 + 0.25 * di  # driver pace
            team = f"Team{di // 2}"
            n_laps = int(rng.integers(44, 56))
            # stint plan: 3 stints with boundaries; compound per stint
            b1, b2 = sorted(rng.integers(12, n_laps - 8, size=2).tolist())
            if b2 - b1 < 6:
                b2 = min(n_laps - 4, b1 + 12)
            bounds = [0, b1, b2, n_laps]
            stint_compounds = [
                COMPOUNDS[int(rng.integers(0, 3))] for _ in range(3)
            ]
            # one rainy event: driver 0's last stint is INTERMEDIATE
            if ei == 7 and driver == "VER":
                stint_compounds[2] = "INTERMEDIATE"
            # per-stint degradation slope in s/lap
            slopes = rng.uniform(-0.05, 0.35, size=3)
            # the var_x == 0 fixture: VER GP00 stint 3 has constant TyreLife
            const_tyre = ei == 0 and driver == "VER"
            for si in range(3):
                stint_no = float(si + 1)
                comp = stint_compounds[si]
                for k in range(bounds[si], bounds[si + 1]):
                    lapno = float(k + 1)
                    tyre_life = float(k - bounds[si] + 1)
                    if const_tyre and si == 2:
                        tyre_life = 5.0  # constant → var_x == 0
                    lap_s = float(
                        base
                        + event_offset
                        + slopes[si] * tyre_life
                        + rng.uniform(-0.4, 0.4)
                    )
                    # missing-value injection (both flavors)
                    u = rng.uniform()
                    lap_time: float | None = float(round(lap_s, 3))
                    if u < 0.02:
                        lap_time = None
                    elif u < 0.04:
                        lap_time = nan
                    # TyreLife missing occasionally (both flavors)
                    v = rng.uniform()
                    tl: float | None = tyre_life
                    if v < 0.01:
                        tl = None
                    elif v < 0.02:
                        tl = nan
                    is_accurate = bool(rng.uniform() > 0.10)
                    # pit-out on stint's first lap (except race start),
                    # pit-in on the lap before a stint change
                    pit_in = (
                        float(round(lap_s - 0.8, 3))
                        if (k + 1 in (bounds[1], bounds[2]))
                        else (None if rng.uniform() < 0.5 else nan)
                    )
                    pit_out = (
                        float(round(2.1 + 0.01 * k, 3))
                        if (k in (bounds[1], bounds[2]))
                        else (None if rng.uniform() < 0.5 else nan)
                    )
                    s1 = float(round(lap_s * 0.3, 3))
                    s2 = float(round(lap_s * 0.4, 3))
                    s3 = float(round(lap_s - s1 - s2, 3))
                    rows.append(
                        (
                            driver, team, lapno, stint_no, comp, tl,
                            lap_time, s1, s2, s3, pit_in, pit_out,
                            is_accurate, "1", YEAR, event, SESSION,
                            INGESTED_AT,
                        )
                    )
    return rows


def write_laps_parquet(spark, path: str) -> None:
    """Write the fixture through Spark so the NULL-vs-NaN duality survives
    (pandas float64 would collapse None into NaN)."""
    spark.createDataFrame(build_laps_rows(), SPARK_SCHEMA).coalesce(2).write.mode(
        "overwrite"
    ).parquet(path)
