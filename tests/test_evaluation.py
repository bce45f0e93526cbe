"""Independent naive-form pins for the evaluation-metric faces.

The DuckDB oracles prove Spark and SQL state the same computation; these
tests prove the computation itself is the textbook metric, by recomputing
AUC and NDCG with naive O(n²)/O(n log n) Python over the same small-SF
inputs (the triangle-undercount lesson: hash-green is not semantics-green
when both engines share a bug).
"""

from __future__ import annotations

import math

import duckdb

from f1_bigdata_pyspark_spark.queries.registry import get_query

from tests.conftest import SF_SMOKE


def _docs_scored(sf_dir: str):
    """(y, quantized score) per doc, recomputed independently in Python."""
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    stop = {"the", "a", "an", "of", "to", "and", "in", "is"}
    out = []
    for lang, text in rows:
        toks = text.split(" ")
        if not toks:
            continue
        y = 1 if lang == "en" else 0
        # HALF_UP on the same double expression Spark states (Python's
        # round() is HALF_EVEN and diverges at exact .5 boundaries like 1/16)
        sq = math.floor(sum(t in stop for t in toks) / len(toks) * 1000.0 + 0.5)
        out.append((y, sq))
    return out


def test_auc_matches_pairwise_count(spark):
    """Histogram rank-sum AUC == the naive over-all-pairs definition:
    P(score_pos > score_neg) + ½·P(tie)."""
    scored = _docs_scored(SF_SMOKE)
    pos = [s for y, s in scored if y == 1]
    neg = [s for y, s in scored if y == 0]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    naive = (wins + 0.5 * ties) / (len(pos) * len(neg))

    row = get_query("quality_classifier_auc").fn(spark, SF_SMOKE).collect()[0]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert abs(row["auc"] - naive) < 1e-6, (row["auc"], naive)


def test_ndcg_matches_naive_recompute(spark):
    """Relational NDCG@10 == naive per-query Python recompute (rank by
    rounded cosine with vec_id tie-break, binary same-label relevance)."""
    con = duckdb.connect()
    vecs = {
        vid: (emb, lab)
        for vid, emb, lab in con.sql(
            f"SELECT vec_id, embedding, label FROM '{SF_SMOKE}/embeddings.parquet'"
        ).fetchall()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    expected = {}
    for qid in range(5):
        qv, qlab = vecs[qid]
        cand = sorted(
            (
                (-round(cos(emb, qv), 6), vid, 1 if lab == qlab else 0)
                for vid, (emb, lab) in vecs.items()
                if vid != qid
            ),
        )
        total_rel = sum(rel for _, _, rel in cand)
        # quantized exactly as the operator states it
        dcg = sum(
            round(rel * 1e9 / math.log2(rk + 1))
            for rk, (_, _, rel) in enumerate(cand[:10], start=1)
        )
        idcg = sum(
            round(1e9 / math.log2(i + 1))
            for i in range(1, min(total_rel, 10) + 1)
        )
        expected[qid] = round(dcg / idcg, 6)

    got = {
        r["query_id"]: r["ndcg_at_k"]
        for r in get_query("ndcg_label_retrieval").fn(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_isotonic_matches_naive_pav(spark):
    """Recompute the isotonic fit with the textbook sequential
    pool-adjacent-violators sweep (the algorithm the relational minimax
    form replaces) and pin equality bin-by-bin."""
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT lang, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    stop = {"the", "a", "an", "of", "to", "and", "in", "is"}
    cells: dict[int, list[int]] = {}
    for lang, text in rows:
        toks = text.split(" ")
        if not toks:
            continue
        b = math.floor(sum(t in stop for t in toks) / len(toks) * 20.0 + 0.5)
        n, p = cells.get(b, (0, 0))
        cells[b] = (n + 1, p + (1 if lang == "en" else 0))
    bins = sorted(cells)
    # classic PAV: pools of (weight, sum); merge while the mean decreases
    pools: list[list[float]] = []  # [weight, positives]
    for b in bins:
        n, p = cells[b]
        pools.append([n, p])
        while (
            len(pools) > 1
            and pools[-2][1] * pools[-1][0] >= pools[-1][1] * pools[-2][0]
        ):
            w2, s2 = pools.pop()
            pools[-1][0] += w2
            pools[-1][1] += s2
    expected = {}
    i = 0
    for w, s in pools:
        rate = round(s / w, 6)
        consumed = 0
        while consumed < w:
            n, _ = cells[bins[i]]
            expected[bins[i]] = rate
            consumed += n
            i += 1
    got = {
        r["bin"]: r["iso_rate"]
        for r in get_query("isotonic_calibration_bins")
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert got == expected


def test_kneser_ney_matches_naive_recompute(spark):
    """Full independent recompute of the interpolated-KN per-source stats
    in pure Python over the same docs (counts, discount, continuation
    mass, per-doc mean, HALF_UP quantization) — hash-green alone can't
    catch a smoothing formula both engines mis-state the same way."""
    import collections

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, source, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    big = collections.Counter()
    cl = collections.Counter()
    n1f = collections.defaultdict(set)
    n1b = collections.defaultdict(set)
    doc_pairs = {}
    for doc_id, source, text in rows:
        w = text.split(" ")
        ps = list(zip(w, w[1:]))
        if not ps:
            continue
        doc_pairs[doc_id] = (source, ps)
        for a, b in ps:
            big[(a, b)] += 1
            cl[a] += 1
            n1f[a].add(b)
            n1b[b].add(a)
    nbig = len(big)
    d = 0.75

    def lnp(a, b):
        return math.log(
            (big[(a, b)] - d) / cl[a]
            + (d * len(n1f[a]) / cl[a]) * (len(n1b[b]) * 1.0 / nbig)
        )

    def q(x, dp):  # HALF_UP like both engines (Python round is HALF_EVEN)
        s = 10**dp
        return math.floor(x * s + 0.5) / s if x >= 0 else -math.floor(-x * s + 0.5) / s

    per_source = collections.defaultdict(list)
    for doc_id, (source, ps) in doc_pairs.items():
        xent = q(-sum(lnp(a, b) for a, b in ps) / len(ps), 6)
        per_source[source].append(xent)
    expected = {}
    for s, xs in per_source.items():
        xs.sort()
        n = len(xs)
        med = xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2
        expected[s] = (
            n,
            q(sum(xs) / n, 4),
            q(min(xs), 6),
            q(max(xs), 6),
            q(med, 6),
        )
    got = {
        r["source"]: (
            r["n_docs"],
            r["avg_xent"],
            r["min_xent"],
            r["max_xent"],
            r["median_xent"],
        )
        for r in get_query("kneser_ney_lm_scores").fn(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_metered_series_faces_match_naive_recompute(spark):
    """OHLC, TWAP, and debounce recomputed independently in pure Python
    over the raw events (struct-extrema order, integer-µs segment math,
    lag-gap rule) — the oracle proves Spark==SQL; this proves both mean
    the textbook operation."""
    import collections
    import datetime

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT event_id, ts, user_id, event_type, value "
        f"FROM '{SF_SMOKE}/events.parquet'"
    ).fetchall()

    def q6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6 if x >= 0 else -math.floor(-x * 1e6 + 0.5) / 1e6

    # --- OHLC ---
    by_day = collections.defaultdict(list)
    for eid, ts, uid, et, v in rows:
        if v is None:
            continue
        by_day[ts.date()].append((ts, eid, v))
    expected_ohlc = {}
    for day, evs in by_day.items():
        evs.sort()
        vals = [v for _, _, v in evs]
        expected_ohlc[day] = (
            q6(evs[0][2]), q6(max(vals)), q6(min(vals)), q6(evs[-1][2]), len(evs)
        )
    got = {
        r["day"]: (
            r["open_value"], r["high_value"], r["low_value"],
            r["close_value"], r["n_events"],
        )
        for r in get_query("daily_value_ohlc").fn(spark, SF_SMOKE).collect()
    }
    assert got == expected_ohlc

    # --- TWAP (integer-µs, div-1000 truncation) ---
    epoch = datetime.datetime(1970, 1, 1)
    expected_twap = {}
    for day, evs in by_day.items():
        evs.sort()
        vw = g = n = 0
        for (t1, e1, v1), (t2, e2, _) in zip(evs, evs[1:]):
            gap_ms = (
                int((t2 - epoch).total_seconds() * 1e6)
                - int((t1 - epoch).total_seconds() * 1e6)
            ) // 1000
            vw += int(math.floor(v1 * 1e6 + 0.5)) * gap_ms
            g += gap_ms
            n += 1
        if g > 0:
            expected_twap[day] = (n, g, q6(vw / g / 1e6))
    got_twap = {
        r["day"]: (r["n_segments"], r["covered_ms"], r["twa_value"])
        for r in get_query("daily_time_weighted_value")
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert got_twap == expected_twap

    # --- debounce (>=5s after predecessor per user/type stream) ---
    streams = collections.defaultdict(list)
    for eid, ts, uid, et, v in rows:
        streams[(uid, et)].append((ts, eid))
    raw = collections.Counter()
    kept = collections.Counter()
    for (uid, et), evs in streams.items():
        evs.sort()
        prev = None
        for ts, eid in evs:
            raw[et] += 1
            t_us = int((ts - epoch).total_seconds() * 1e6)
            if prev is None or t_us - prev >= 5_000_000:
                kept[et] += 1
            prev = t_us
    got_db = {
        r["event_type"]: (r["n_raw"], r["n_kept"])
        for r in get_query("event_debounce_stats").fn(spark, SF_SMOKE).collect()
    }
    assert got_db == {et: (raw[et], kept[et]) for et in raw}


def test_anf_hop1_estimate_within_hll_error_of_exact(spark):
    """ANF's hop-1 HLL estimate must sit within sketch error of the EXACT
    average closed-1-hop-neighborhood size (m=64 -> ~1.04/sqrt(64) = 13%
    standard error; assert 3 sigma). Pins that the register merge really
    tracks the frontier, independent of the oracle replay."""
    con = duckdb.connect()
    exact = con.sql(
        f"""
        WITH pairs AS (
          SELECT DISTINCT l_partkey, l_suppkey
          FROM '{SF_SMOKE}/lineitem.parquet'
        ),
        edges AS (
          SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
          FROM pairs a JOIN pairs b
            ON a.l_partkey = b.l_partkey AND a.l_suppkey <> b.l_suppkey
        )
        SELECT avg(cnt + 1) FROM (
          SELECT src, count(DISTINCT dst) AS cnt FROM edges GROUP BY src
        )
        """
    ).fetchone()[0]
    rows = {
        r["hop"]: r["avg_neighborhood_est"]
        for r in get_query("supplier_anf_curve").fn(spark, SF_SMOKE).collect()
    }
    assert abs(rows[1] - exact) / exact < 0.39, (rows[1], exact)
    # hop 0 is a single element; hop estimates are monotone nondecreasing
    assert rows[0] < 2.0
    assert rows[0] <= rows[1] <= rows[2] + 1e-9
