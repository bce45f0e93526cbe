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
