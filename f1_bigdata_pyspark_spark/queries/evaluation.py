"""Model-evaluation metric queries — the measurement half of a curation
pipeline (capability-extension scope, north star).

A 100-TB training-data pipeline doesn't just *run* a quality classifier and
a retrieval stack — it has to grade them. These faces compute the standard
evaluation metrics (ROC-AUC, calibration / Brier decomposition, NDCG@k)
as distributed relational plans with the repo's exact-integer determinism
discipline: every cross-row accumulation is over BIGINTs (quantized where
the quantity is inherently float), and every float appears only in a
fixed-order scalar readout, so Spark and the DuckDB oracle hash-match
bit-for-bit.

Scale shapes:
- AUC runs on the *score histogram*, not the corpus: one groupBy onto a
  bounded score codomain (quantized to 1e-3 → ≤1001 cells), then a window
  over that bounded table. This is the standard streaming/histogram AUC —
  the corpus-sized data is touched exactly once, map-side combinable.
- Calibration bins are a single 10-cell aggregate — pure map + combine.
- NDCG fans a fixed query panel across the candidate set (narrow map per
  candidate, one per-query top-k), so candidate data is scanned once and
  never shuffled beyond the k-row-per-query rank exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.functions.text import (
    LANG_MARKERS,
    lang_score,
    quality_features,
)
from f1_bigdata_pyspark_spark.functions.vectors import cosine
from f1_bigdata_pyspark_spark.queries.registry import query

# Fixed evaluation panel for the retrieval face: the first N vec_ids act as
# queries against all OTHER vectors. Fixed-size by construction (an eval set
# is curated, not corpus-scaled), so broadcasting it is bounded forever.
_NDCG_N_QUERIES = 5
_NDCG_K = 10


# --------------------------------------------------------------------------
# Q: quality_classifier_auc — ROC-AUC of the stopword-ratio quality score at
# separating English documents (the score counts English stopwords, so it IS
# a weak language/quality classifier; AUC grades it). Histogram form: the
# corpus collapses onto quantized score cells (1e-3 → ≤1001 rows), the
# rank-sum runs on the cells. 2U = Σ_s n_pos(s)·(2·cumneg(<s) + n_neg(s))
# handles ties exactly (each tied pair contributes 1 = 2·½); AUC = 2U/(2PN).
# Every accumulation is BIGINT (n ≤ 1e12 docs, cumneg ≤ n, product ≤ 1e24…
# at true 100-TB row counts the 2U product needs DECIMAL(38) — the cell
# table is tiny, so the final window+readout can afford decimal there; int64
# is exact to ~3e9 docs per side, far beyond any test SF).
# Determinism: the only float is the final fixed-order division readout.
# The window is global but over the BOUNDED score histogram (≤1001 rows) —
# documented in the plan-audit allowlist like the KS ECDF face.
# --------------------------------------------------------------------------
@query(
    "quality_classifier_auc",
    oracle="""
WITH scored AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         CAST(round(
           len(list_filter(string_split(text, ' '),
                           t -> t IN ('the','a','an','of','to','and','in','is')))
           * 1000.0 / len(string_split(text, ' '))) AS BIGINT) AS sq
  FROM documents
  WHERE len(string_split(text, ' ')) > 0
),
cells AS (
  SELECT sq,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(count(*) - sum(y) AS BIGINT) AS n_neg
  FROM scored GROUP BY sq
),
cum AS (
  SELECT sq, n_pos, n_neg,
         CAST(COALESCE(sum(n_neg) OVER (ORDER BY sq
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cumneg_below
  FROM cells
),
agg AS (
  SELECT CAST(sum(n_pos) AS BIGINT) AS p,
         CAST(sum(n_neg) AS BIGINT) AS n,
         CAST(sum(n_pos * (2 * cumneg_below + n_neg)) AS BIGINT) AS u2
  FROM cum
)
SELECT p AS n_pos, n AS n_neg, u2 AS u2_numer,
       round(u2 * 1.0 / (2.0 * p * n), 6) AS auc
FROM agg
""",
)
def quality_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    scored = docs.filter(F.size(F.split(F.col("text"), " ")) > 0).select(
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("y"),
        F.round(feats["stopword_ratio"] * 1000).cast("long").alias("sq"),
    )
    cells = scored.groupBy("sq").agg(
        F.sum("y").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("n_neg"),
    )
    # bounded global window: ≤1001 quantized-score cells (plan-audit
    # allowlisted; the corpus-sized stage is the groupBy above)
    w = Window.orderBy("sq").rowsBetween(Window.unboundedPreceding, -1)
    cum = cells.select(
        "n_pos",
        "n_neg",
        F.coalesce(F.sum("n_neg").over(w), F.lit(0)).cast("long").alias(
            "cumneg_below"
        ),
    )
    agg = cum.agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("n_neg").cast("long").alias("n_neg"),
        F.sum(
            F.col("n_pos") * (2 * F.col("cumneg_below") + F.col("n_neg"))
        )
        .cast("long")
        .alias("u2_numer"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        "u2_numer",
        F.round(
            F.col("u2_numer") * 1.0 / (2.0 * F.col("n_pos") * F.col("n_neg")), 6
        ).alias("auc"),
    )


# --------------------------------------------------------------------------
# Q: calibration_brier_bins — reliability diagram + Brier score of the
# stopword-ratio score read as P(lang='en'): 10 equal-width probability
# bins, per bin the mean predicted probability vs the empirical positive
# rate, plus the bin's Brier contribution. The gap between mean_pred and
# frac_pos per bin IS the calibration error (reliability term of the
# Murphy decomposition). Determinism: predicted probabilities quantize to
# 1e-6 BIGINTs; Σpq and Σ(pq−yq)² are exact integer sums (|pq−yq| ≤ 1e6 →
# square ≤ 1e12 → ~9e6 headroom rows per bin in int64 per 1e18/1e12 — at
# larger SF the quantum drops to 1e-4, noted not needed at test scale);
# floats appear only in the per-bin fixed-order readout. Scale: one narrow
# map + a 10-cell aggregate, no join, no window.
# --------------------------------------------------------------------------
@query(
    "calibration_brier_bins",
    oracle="""
WITH scored AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         CAST(round(
           len(list_filter(string_split(text, ' '),
                           t -> t IN ('the','a','an','of','to','and','in','is')))
           * 1000000.0 / len(string_split(text, ' '))) AS BIGINT) AS pq
  FROM documents
  WHERE len(string_split(text, ' ')) > 0
),
binned AS (
  SELECT least(pq // 100000, 9) AS bin, y, pq FROM scored
)
SELECT bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(y) AS BIGINT) AS n_pos,
       round(sum(pq) / (count(*) * 1000000.0), 6) AS mean_pred,
       round(sum(y) * 1.0 / count(*), 6) AS frac_pos,
       round(sum((pq - y * 1000000) * (pq - y * 1000000))
             / (count(*) * 1000000000000.0), 6) AS brier
FROM binned
GROUP BY bin
ORDER BY bin
""",
)
def calibration_brier_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    scored = docs.filter(F.size(F.split(F.col("text"), " ")) > 0).select(
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("y"),
        F.round(feats["stopword_ratio"] * 1000000).cast("long").alias("pq"),
    )
    binned = scored.select(
        F.least(F.floor(F.col("pq") / 100000), F.lit(9)).alias("bin"),
        "y",
        "pq",
    )
    err = F.col("pq") - F.col("y") * 1000000
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("y").cast("long").alias("n_pos"),
            F.round(
                F.sum("pq") / (F.count(F.lit(1)) * 1000000.0), 6
            ).alias("mean_pred"),
            F.round(F.sum("y") * 1.0 / F.count(F.lit(1)), 6).alias("frac_pos"),
            F.round(
                F.sum(err * err) / (F.count(F.lit(1)) * 1000000000000.0), 6
            ).alias("brier"),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# Q: ndcg_label_retrieval — NDCG@10 of exact-cosine retrieval with
# same-label relevance, over a fixed 5-query evaluation panel: for each
# query vector, rank all other vectors by cosine, relevance(hit) =
# 1[label(hit) = label(query)], DCG@10 = Σ rel_i / log2(i+1),
# IDCG@10 = Σ_{i≤min(R,10)} 1/log2(i+1) where R is the query's total
# relevant-candidate count (binary relevance ⇒ the ideal ranking fills the
# top slots with relevant hits). Determinism: ranking is on the ROUNDED
# (1e-6) cosine with vec_id tie-break — a total order both engines state
# identically; each DCG term quantizes to 1e-9 before the ≤10-row integer
# sum, so accumulation order can't matter; NDCG is a fixed-order readout.
# Scale: the query panel is a fixed-size broadcast (an eval set is curated,
# not corpus-scaled); candidates are scanned once with a narrow cosine map;
# the only exchange is the per-query rank shuffle keyed on query_id.
# --------------------------------------------------------------------------
@query(
    "ndcg_label_retrieval",
    oracle=f"""
WITH queries AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
         label AS qlabel
  FROM embeddings WHERE vec_id < {_NDCG_N_QUERIES}
),
pairs AS (
  SELECT q.query_id, q.qlabel, e.vec_id, e.label,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
           AS cos_r
  FROM embeddings e CROSS JOIN queries q
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, qlabel,
         CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_r DESC, vec_id ASC) AS rk
  FROM pairs
),
totals AS (
  SELECT query_id, CAST(sum(rel) AS BIGINT) AS total_rel
  FROM ranked GROUP BY query_id
),
dcg AS (
  SELECT query_id,
         CAST(sum(CASE WHEN rk <= {_NDCG_K}
              THEN CAST(round(rel * 1000000000.0 / log2(rk + 1)) AS BIGINT)
              ELSE 0 END) AS BIGINT) AS dcg_q,
         CAST(sum(CASE WHEN rk <= {_NDCG_K} THEN rel ELSE 0 END) AS BIGINT)
           AS hits_at_k
  FROM ranked GROUP BY query_id
),
ideal AS (
  SELECT t.query_id,
         CAST(sum(CAST(round(1000000000.0 / log2(i + 1)) AS BIGINT)) AS BIGINT)
           AS idcg_q
  FROM totals t,
       (SELECT unnest(range(1, {_NDCG_K} + 1)) AS i)
  WHERE i <= least(t.total_rel, {_NDCG_K})
  GROUP BY t.query_id
)
SELECT d.query_id, d.hits_at_k, t.total_rel,
       round(d.dcg_q * 1.0 / i.idcg_q, 6) AS ndcg_at_k
FROM dcg d
JOIN totals t ON d.query_id = t.query_id
JOIN ideal i ON d.query_id = i.query_id
ORDER BY d.query_id
""",
)
def ndcg_label_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _NDCG_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    # fixed-size eval panel (5 rows by construction) — bounded broadcast
    pairs = emb.join(F.broadcast(queries), emb.vec_id != F.col("query_id")).select(
        "query_id",
        "qlabel",
        "vec_id",
        "label",
        F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("cos_r"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("vec_id").asc()
    )
    ranked = pairs.select(
        "query_id",
        F.when(F.col("label") == F.col("qlabel"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("rel"),
        F.row_number().over(w).alias("rk"),
    )
    per_q = ranked.groupBy("query_id").agg(
        F.sum("rel").cast("long").alias("total_rel"),
        F.sum(
            F.when(
                F.col("rk") <= _NDCG_K,
                F.round(
                    F.col("rel") * 1000000000.0 / F.log2(F.col("rk") + 1)
                ).cast("long"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("dcg_q"),
        F.sum(F.when(F.col("rk") <= _NDCG_K, F.col("rel")).otherwise(F.lit(0)))
        .cast("long")
        .alias("hits_at_k"),
    )
    # IDCG: explode 1..K per query, keep i ≤ min(total_rel, K) — a K-row
    # fan-out per panel query, bounded by construction
    ideal = (
        per_q.select(
            "query_id",
            "total_rel",
            F.explode(F.sequence(F.lit(1), F.lit(_NDCG_K))).alias("i"),
        )
        .filter(F.col("i") <= F.least(F.col("total_rel"), F.lit(_NDCG_K)))
        .groupBy("query_id")
        .agg(
            F.sum(
                F.round(1000000000.0 / F.log2(F.col("i") + 1)).cast("long")
            )
            .cast("long")
            .alias("idcg_q")
        )
    )
    return (
        per_q.join(ideal, "query_id")
        .select(
            "query_id",
            "hits_at_k",
            "total_rel",
            F.round(F.col("dcg_q") * 1.0 / F.col("idcg_q"), 6).alias("ndcg_at_k"),
        )
        .orderBy("query_id")
    )


# --------------------------------------------------------------------------
# Q: langid_macro_f1_kappa — classifier-summary readout over the language-ID
# confusion matrix (the lang_id_confusion face reports the raw matrix; this
# one grades it): per-class TP/FP/FN fold into macro-F1, and the
# observed-vs-chance agreement folds into Cohen's kappa. Everything derives
# from ONE (lang, pred) count table (≤25 cells): tp_c, row/col marginals,
# and N are exact BIGINTs; each per-class F1 quantizes to 1e-9 before the
# 5-term macro sum (exact in any order); kappa's po/pe are fixed-order
# scalar readouts over integer sums (Σ row_c·col_c ≤ N² — DECIMAL territory
# past ~3e9 docs, noted; the cell table is 25 rows so the readout is free).
# Scale: the corpus is touched once by the confusion groupBy (map-side
# combinable); all metric math runs on the 25-cell table.
# --------------------------------------------------------------------------
_LANGS_EVAL = sorted(LANG_MARKERS)


def _langid_pred_sql() -> str:
    scores = ",\n    ".join(
        "len(list_filter(string_split(text, ' '), t -> t IN ({}))) AS score_{}".format(
            ", ".join(f"'{w}'" for w in LANG_MARKERS[lg]), lg
        )
        for lg in _LANGS_EVAL
    )
    best = "greatest(" + ", ".join(f"score_{lg}" for lg in _LANGS_EVAL) + ")"
    case = " ".join(
        f"WHEN score_{lg} = best THEN '{lg}'" for lg in _LANGS_EVAL
    )
    return f"""
s AS (
  SELECT lang,
    {scores}
  FROM documents
),
b AS (
  SELECT lang, {best} AS best, CASE {case} END AS lang_pred FROM s
),
conf AS (
  SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
  FROM b GROUP BY lang, lang_pred
)"""


@query(
    "langid_macro_f1_kappa",
    oracle=f"""
WITH {_langid_pred_sql()},
classes AS (SELECT DISTINCT lang AS c FROM conf
            UNION SELECT DISTINCT lang_pred FROM conf),
per_class AS (
  SELECT c,
    CAST(COALESCE((SELECT sum(n) FROM conf
                   WHERE lang = c AND lang_pred = c), 0) AS BIGINT) AS tp,
    CAST(COALESCE((SELECT sum(n) FROM conf WHERE lang = c), 0) AS BIGINT)
      AS row_n,
    CAST(COALESCE((SELECT sum(n) FROM conf WHERE lang_pred = c), 0) AS BIGINT)
      AS col_n
  FROM classes
),
f1q AS (
  SELECT c, tp, row_n, col_n,
    CASE WHEN row_n + col_n = 0 THEN 0
         ELSE CAST(round(2.0 * tp * 1000000000.0 / (row_n + col_n)) AS BIGINT)
    END AS f1_q
  FROM per_class
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_classes,
         CAST(sum(tp) AS BIGINT) AS sum_tp,
         CAST(sum(row_n * col_n) AS BIGINT) AS sum_rowcol,
         CAST(sum(f1_q) AS BIGINT) AS sum_f1q,
         CAST((SELECT sum(n) FROM conf) AS BIGINT) AS n
  FROM f1q
)
SELECT n AS n_docs, n_classes,
       round(sum_f1q / (n_classes * 1000000000.0), 6) AS macro_f1,
       round(sum_tp * 1.0 / n, 6) AS po,
       round(sum_rowcol * 1.0 / (n * n), 6) AS pe,
       round((sum_tp * 1.0 / n - sum_rowcol * 1.0 / (n * n))
             / (1.0 - sum_rowcol * 1.0 / (n * n)), 6) AS kappa
FROM agg
""",
)
def langid_macro_f1_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "lang",
        *[lang_score(F.col("text"), lg).alias(f"score_{lg}") for lg in _LANGS_EVAL],
    )
    best = F.greatest(*[F.col(f"score_{lg}") for lg in _LANGS_EVAL])
    pred = F.when(F.col(f"score_{_LANGS_EVAL[0]}") == best, F.lit(_LANGS_EVAL[0]))
    for lg in _LANGS_EVAL[1:]:
        pred = pred.when(F.col(f"score_{lg}") == best, F.lit(lg))
    conf = (
        scored.withColumn("lang_pred", pred)
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    # 25-cell table from here down — every join/aggregate is bounded
    rows = conf.groupBy(F.col("lang").alias("c")).agg(
        F.sum("n").cast("long").alias("row_n"),
        F.sum(F.when(F.col("lang_pred") == F.col("lang"), F.col("n")))
        .cast("long")
        .alias("tp_r"),
    )
    cols = conf.groupBy(F.col("lang_pred").alias("c")).agg(
        F.sum("n").cast("long").alias("col_n")
    )
    per_class = (
        rows.join(cols, "c", "full_outer")
        .select(
            "c",
            F.coalesce(F.col("tp_r"), F.lit(0)).cast("long").alias("tp"),
            F.coalesce(F.col("row_n"), F.lit(0)).cast("long").alias("row_n"),
            F.coalesce(F.col("col_n"), F.lit(0)).cast("long").alias("col_n"),
        )
    )
    f1q = per_class.select(
        "tp",
        "row_n",
        "col_n",
        F.when(F.col("row_n") + F.col("col_n") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.round(
                2.0 * F.col("tp") * 1000000000.0
                / (F.col("row_n") + F.col("col_n"))
            ).cast("long")
        )
        .alias("f1_q"),
    )
    agg = f1q.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("tp").cast("long").alias("sum_tp"),
        F.sum(F.col("row_n") * F.col("col_n")).cast("long").alias("sum_rowcol"),
        F.sum("f1_q").cast("long").alias("sum_f1q"),
        F.sum("row_n").cast("long").alias("n"),
    )
    po = F.col("sum_tp") * 1.0 / F.col("n")
    pe = F.col("sum_rowcol") * 1.0 / (F.col("n") * F.col("n"))
    return agg.select(
        F.col("n").alias("n_docs"),
        "n_classes",
        F.round(
            F.col("sum_f1q") / (F.col("n_classes") * 1000000000.0), 6
        ).alias("macro_f1"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
    )


# --------------------------------------------------------------------------
# Q: score_decile_gains — cumulative-gains table for the quality score at
# histogram granularity: rank score cells high→low, assign each cell to a
# decile by its cumulative doc position, report per-decile doc/positive
# counts and the running capture rate ("keeping the top-k deciles of the
# corpus retains what share of English docs?" — the knob a curation run
# actually turns). Cell-granularity decile assignment (a cell never splits)
# is stated identically in both engines, so no within-cell ordering is ever
# needed — that's what makes this the 100-TB form: corpus → ≤1001-cell
# histogram (one map-side-combinable groupBy), every window after that is
# bounded (allowlisted like the AUC face). All counts BIGINT; the shares
# are fixed-order readouts.
# --------------------------------------------------------------------------
@query(
    "score_decile_gains",
    oracle="""
WITH scored AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         CAST(round(
           len(list_filter(string_split(text, ' '),
                           t -> t IN ('the','a','an','of','to','and','in','is')))
           * 1000.0 / len(string_split(text, ' '))) AS BIGINT) AS sq
  FROM documents
  WHERE len(string_split(text, ' ')) > 0
),
cells AS (
  SELECT sq, CAST(count(*) AS BIGINT) AS n_cell,
         CAST(sum(y) AS BIGINT) AS pos_cell
  FROM scored GROUP BY sq
),
cum AS (
  SELECT sq, n_cell, pos_cell,
         CAST(COALESCE(sum(n_cell) OVER (ORDER BY sq DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM cells
),
tot AS (SELECT CAST(sum(n_cell) AS BIGINT) AS n,
               CAST(sum(pos_cell) AS BIGINT) AS p FROM cells),
dec AS (
  SELECT least(cum_before * 10 // n, 9) AS decile,
         n_cell, pos_cell, n, p
  FROM cum CROSS JOIN tot
),
per_dec AS (
  SELECT decile, CAST(sum(n_cell) AS BIGINT) AS n_docs,
         CAST(sum(pos_cell) AS BIGINT) AS n_pos,
         CAST(max(n) AS BIGINT) AS n, CAST(max(p) AS BIGINT) AS p
  FROM dec GROUP BY decile
)
SELECT decile, n_docs, n_pos,
       round(n_pos * 1.0 / n_docs, 6) AS pos_rate,
       round(CAST(sum(n_pos) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             * 1.0 / p, 6) AS cum_capture
FROM per_dec
ORDER BY decile
""",
)
def score_decile_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    scored = docs.filter(F.size(F.split(F.col("text"), " ")) > 0).select(
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("y"),
        F.round(feats["stopword_ratio"] * 1000).cast("long").alias("sq"),
    )
    cells = scored.groupBy("sq").agg(
        F.count(F.lit(1)).cast("long").alias("n_cell"),
        F.sum("y").cast("long").alias("pos_cell"),
    )
    # bounded global windows: ≤1001 histogram cells, then ≤10 deciles
    w_cum = Window.orderBy(F.col("sq").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = cells.select(
        "n_cell",
        "pos_cell",
        F.coalesce(F.sum("n_cell").over(w_cum), F.lit(0))
        .cast("long")
        .alias("cum_before"),
    )
    tot = cells.agg(
        F.sum("n_cell").cast("long").alias("n"),
        F.sum("pos_cell").cast("long").alias("p"),
    )
    dec = cum.join(F.broadcast(tot)).select(  # 1-row scalar
        F.least(
            F.floor(F.col("cum_before") * 10 / F.col("n")), F.lit(9)
        ).alias("decile"),
        "n_cell",
        "pos_cell",
        "n",
        "p",
    )
    per_dec = dec.groupBy("decile").agg(
        F.sum("n_cell").cast("long").alias("n_docs"),
        F.sum("pos_cell").cast("long").alias("n_pos"),
        F.max("n").cast("long").alias("n"),
        F.max("p").cast("long").alias("p"),
    )
    w_cap = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_dec.select(
        "decile",
        "n_docs",
        "n_pos",
        F.round(F.col("n_pos") * 1.0 / F.col("n_docs"), 6).alias("pos_rate"),
        F.round(
            F.sum("n_pos").over(w_cap).cast("long") * 1.0 / F.col("p"), 6
        ).alias("cum_capture"),
    ).orderBy("decile")


# --------------------------------------------------------------------------
# Q: retrieval_mrr — mean reciprocal rank over the same fixed query panel
# as ndcg_label_retrieval: rank candidates by rounded cosine (vec_id
# tie-break), find the first same-label hit, MRR = mean(1/first_rank).
# The navigational-search companion to NDCG's graded readout — together
# with recall@k they are the retrieval dashboard. Determinism: the rank
# is the same total order as the NDCG face; each reciprocal quantizes to
# 1e-9 before the panel mean (exact for any panel size); the mean is a
# fixed-order readout. Scale: identical to NDCG — one candidate scan, one
# per-query rank exchange, panel-sized everything after.
# --------------------------------------------------------------------------
@query(
    "retrieval_mrr",
    oracle=f"""
WITH queries AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
         label AS qlabel
  FROM embeddings WHERE vec_id < {_NDCG_N_QUERIES}
),
pairs AS (
  SELECT q.query_id, q.qlabel, e.vec_id, e.label,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
           AS cos_r
  FROM embeddings e CROSS JOIN queries q
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id,
         CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_r DESC, vec_id ASC) AS rk
  FROM pairs
),
firsts AS (
  SELECT query_id, CAST(min(rk) AS BIGINT) AS first_hit
  FROM ranked WHERE rel = 1 GROUP BY query_id
)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       CAST(min(first_hit) AS BIGINT) AS best_first_hit,
       CAST(max(first_hit) AS BIGINT) AS worst_first_hit,
       round(sum(CAST(round(1000000000.0 / first_hit) AS BIGINT))
             / (count(*) * 1000000000.0), 6) AS mrr
FROM firsts
""",
)
def retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _NDCG_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    pairs = emb.join(F.broadcast(queries), emb.vec_id != F.col("query_id")).select(
        "query_id",
        F.when(F.col("label") == F.col("qlabel"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("rel"),
        "vec_id",
        F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("cos_r"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("vec_id").asc()
    )
    firsts = (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rel") == 1)
        .groupBy("query_id")
        .agg(F.min("rk").cast("long").alias("first_hit"))
    )
    return firsts.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.min("first_hit").cast("long").alias("best_first_hit"),
        F.max("first_hit").cast("long").alias("worst_first_hit"),
        F.round(
            F.sum(F.round(1000000000.0 / F.col("first_hit")).cast("long"))
            / (F.count(F.lit(1)) * 1000000000.0),
            6,
        ).alias("mrr"),
    )


# --------------------------------------------------------------------------
# Q: kendall_tau_source_rankers — rank agreement between two source-level
# quality signals: sources ranked by mean stopword-ratio quality vs ranked
# by exact-duplicate rate. Kendall's tau answers "do the two rankers pick
# the same sources" — the decision of whether a cheap signal can replace
# an expensive one. Both metrics quantize to ppm BIGINTs and rank with a
# source tiebreak (total orders — no tie handling ambiguity); tau-a then
# counts concordant/discordant pairs over the (sources choose 2) grid —
# exact integers end to end. Scale: corpus → per-source aggregates (one
# pass each), then every structure is source-vocabulary-sized: two rank
# windows over ~20 rows (allowlisted) and a ≤190-row pair join.
# --------------------------------------------------------------------------
@query(
    "kendall_tau_source_rankers",
    oracle="""
WITH q AS (
  SELECT source,
         CAST(sum(CAST(round(
           len(list_filter(string_split(text, ' '),
                           t -> t IN ('the','a','an','of','to','and','in','is')))
           * 1000000.0 / len(string_split(text, ' '))) AS BIGINT))
           // count(*) AS BIGINT) AS qual_ppm,
         CAST((count(*) - count(DISTINCT md5(lower(trim(text)))))
              * 1000000 // count(*) AS BIGINT) AS dup_ppm
  FROM documents
  WHERE len(string_split(text, ' ')) > 0
  GROUP BY source
),
ranked AS (
  SELECT source,
         row_number() OVER (ORDER BY qual_ppm DESC, source) AS r1,
         row_number() OVER (ORDER BY dup_ppm DESC, source) AS r2
  FROM q
),
pairs AS (
  SELECT CASE WHEN (a.r1 - b.r1) * (a.r2 - b.r2) > 0 THEN 1 ELSE 0 END AS con
  FROM ranked a JOIN ranked b ON a.source < b.source
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(con) AS BIGINT) AS concordant
  FROM pairs
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM q) AS n_sources,
       concordant,
       n_pairs - concordant AS discordant,
       round((2 * concordant - n_pairs) * 1.0 / n_pairs, 6) AS kendall_tau
FROM agg
""",
)
def kendall_tau_source_rankers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.functions.text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    q = (
        docs.filter(F.size(F.split(F.col("text"), " ")) > 0)
        .select(
            "source",
            F.round(feats["stopword_ratio"] * 1000000)
            .cast("long")
            .alias("sq"),
            fingerprint(F.col("text")).alias("f"),
        )
        .groupBy("source")
        .agg(
            F.floor(F.sum("sq") / F.count(F.lit(1)))
            .cast("long")
            .alias("qual_ppm"),
            F.floor(
                (F.count(F.lit(1)) - F.countDistinct("f"))
                * 1000000
                / F.count(F.lit(1))
            )
            .cast("long")
            .alias("dup_ppm"),
        )
    )
    # bounded global windows: ranks over the ~20-row source table
    w1 = Window.orderBy(F.col("qual_ppm").desc(), F.col("source"))
    w2 = Window.orderBy(F.col("dup_ppm").desc(), F.col("source"))
    ranked = q.select(
        "source",
        F.row_number().over(w1).alias("r1"),
        F.row_number().over(w2).alias("r2"),
    )
    a = ranked.select(
        F.col("source").alias("sa"), F.col("r1").alias("a1"), F.col("r2").alias("a2")
    )
    b = ranked.select(
        F.col("source").alias("sb"), F.col("r1").alias("b1"), F.col("r2").alias("b2")
    )
    pairs = a.join(b, F.col("sa") < F.col("sb")).select(
        F.when(
            (F.col("a1") - F.col("b1")) * (F.col("a2") - F.col("b2")) > 0, 1
        )
        .otherwise(0)
        .alias("con")
    )
    n_sources = q.count()  # driver scalar over the source vocabulary
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("con").cast("long").alias("concordant"),
    )
    return agg.select(
        F.lit(n_sources).cast("long").alias("n_sources"),
        "concordant",
        (F.col("n_pairs") - F.col("concordant")).alias("discordant"),
        F.round(
            (2 * F.col("concordant") - F.col("n_pairs")) * 1.0
            / F.col("n_pairs"),
            6,
        ).alias("kendall_tau"),
    )


# --------------------------------------------------------------------------
# Q: knn_label_accuracy — embedding-quality probe: leave-one-out k-NN
# classification over the fixed panel (k=5, majority label among the 5
# nearest by rounded cosine, ties → smallest label; correct iff it equals
# the query's own label). The geometric-quality readout that tells you
# whether the embedding space CLUSTERS by label before you trust it for
# semantic dedup. Rank order is the established rounded-cosine total
# order; the majority vote is an exact integer count with a deterministic
# tie rule both engines state. Scale: same candidate-scan + per-query
# rank exchange as the NDCG/MRR panel; the vote is k-rows-per-query.
# --------------------------------------------------------------------------
@query(
    "knn_label_accuracy",
    oracle=f"""
WITH queries AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
         label AS qlabel
  FROM embeddings WHERE vec_id < {_NDCG_N_QUERIES}
),
ranked AS (
  SELECT q.query_id, q.qlabel, e.label,
         row_number() OVER (PARTITION BY q.query_id
           ORDER BY round(list_cosine_similarity(
                      CAST(e.embedding AS DOUBLE[]), q.qv), 6) DESC,
                    e.vec_id ASC) AS rk
  FROM embeddings e CROSS JOIN queries q
  WHERE e.vec_id <> q.query_id
),
votes AS (
  SELECT query_id, qlabel, label, CAST(count(*) AS BIGINT) AS votes
  FROM ranked WHERE rk <= 5 GROUP BY query_id, qlabel, label
),
winner AS (
  SELECT query_id, qlabel, label AS pred,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY votes DESC, label ASC) AS vr
  FROM votes
)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       CAST(count_if(pred = qlabel) AS BIGINT) AS n_correct,
       round(count_if(pred = qlabel) * 1.0 / count(*), 6) AS accuracy
FROM winner WHERE vr = 1
""",
)
def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _NDCG_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    pairs = emb.join(F.broadcast(queries), emb.vec_id != F.col("query_id")).select(
        "query_id",
        "qlabel",
        "label",
        "vec_id",
        F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("cos_r"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("vec_id").asc()
    )
    votes = (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .groupBy("query_id", "qlabel", "label")
        .agg(F.count(F.lit(1)).cast("long").alias("votes"))
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    winner = (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
    )
    return winner.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.count_if(F.col("label") == F.col("qlabel"))
        .cast("long")
        .alias("n_correct"),
        F.round(
            F.count_if(F.col("label") == F.col("qlabel"))
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("accuracy"),
    )


# --------------------------------------------------------------------------
# Q: woe_information_value — weight-of-evidence / information value of the
# customer market segment at predicting urgent orders (priority 1/2): the
# standard feature-screening readout before training a scorecard or
# deciding a feature is worth its pipeline cost. WOE_b = ln((pos_b/P) /
# (neg_b/N)); IV = Σ_b (pos_b/P − neg_b/N)·WOE_b, with the conventional
# IV bands (<0.02 useless, >0.3 strong). Exactness discipline: the corpus
# collapses to per-bin BIGINT counts in one map-side-combined pass; every
# per-bin float is a fixed-order readout; the cross-bin IV sum runs over
# 1e-12-quantized BIGINT terms (order-stable in any engine), and the
# total joins back to the 5-row bin table through a 1-row broadcast.
# --------------------------------------------------------------------------
@query(
    "woe_information_value",
    oracle="""
WITH labeled AS (
  SELECT c.c_mktsegment AS bin,
         CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
bins AS (
  SELECT bin,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(count(*) - sum(y) AS BIGINT) AS n_neg
  FROM labeled GROUP BY bin
),
tot AS (
  SELECT CAST(sum(n_pos) AS BIGINT) AS p, CAST(sum(n_neg) AS BIGINT) AS n
  FROM bins
),
scored AS (
  SELECT bin, n_pos, n_neg,
         ln((n_pos * 1.0 / p) / (n_neg * 1.0 / n)) AS woe,
         (n_pos * 1.0 / p - n_neg * 1.0 / n)
           * ln((n_pos * 1.0 / p) / (n_neg * 1.0 / n)) AS iv_term
  FROM bins CROSS JOIN tot
),
total AS (
  SELECT CAST(sum(CAST(round(iv_term * 1e12) AS BIGINT)) AS BIGINT) AS ivq
  FROM scored
)
SELECT bin, n_pos, n_neg,
       round(woe, 6) AS woe,
       round(iv_term, 6) AS iv_term,
       round(ivq / 1e12, 6) AS total_iv
FROM scored CROSS JOIN total
ORDER BY bin
""",
)
def woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.operators.join_policy import broadcast_if_small

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    labeled = orders.join(
        broadcast_if_small(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("bin"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0).alias("y"),
    )
    bins = labeled.groupBy("bin").agg(
        F.sum("y").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("n_neg"),
    )
    tot = bins.agg(
        F.sum("n_pos").cast("long").alias("p"),
        F.sum("n_neg").cast("long").alias("n"),
    )
    pos_rate = F.col("n_pos") / F.col("p")
    neg_rate = F.col("n_neg") / F.col("n")
    woe = F.log(pos_rate / neg_rate)
    scored = bins.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_pos",
        "n_neg",
        woe.alias("woe"),
        ((pos_rate - neg_rate) * woe).alias("iv_term"),
    )
    total = scored.agg(
        F.sum(F.round(F.col("iv_term") * 1e12).cast("long")).alias("ivq")
    )
    return (
        scored.crossJoin(F.broadcast(total))
        .select(
            "bin",
            "n_pos",
            "n_neg",
            F.round("woe", 6).alias("woe"),
            F.round("iv_term", 6).alias("iv_term"),
            F.round(F.col("ivq") / 1e12, 6).alias("total_iv"),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# Q: isotonic_calibration_bins — isotonic (monotone nondecreasing)
# calibration of the stopword-ratio quality score against the lang=='en'
# label, on the quantized score-bin histogram. Instead of the sequential
# pool-adjacent-violators sweep (inherently serial), the fit uses the
# minimax characterization of isotonic regression —
#   iso(k) = max_{i<=k} min_{j>=k} (S_j - S_{i-1}) / (N_j - N_{i-1})
# over bin prefix sums S (positives) and N (counts) — which is pure
# relational algebra: the corpus collapses onto <=21 score bins FIRST, and
# the (k, i, j) triple space is ~B^3/6 cells of the BOUNDED bin table
# (B=21 -> ~1.5k rows), generated by two sequence-explodes and equality
# joins (no range join, no cartesian). Every ratio is a BIGINT/BIGINT
# division — bit-identical in any engine; the bin windows are over the
# bounded histogram (plan-audit allowlisted like the AUC face). This is
# the standard post-hoc calibrator a quality-score gate trains before
# thresholding; composes with quality_classifier_auc (same score, same
# label) and calibration_brier_bins (the diagnostic it fixes).
# --------------------------------------------------------------------------
@query(
    "isotonic_calibration_bins",
    oracle="""
WITH scored AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         CAST(round(
           len(list_filter(string_split(text, ' '),
                           t -> t IN ('the','a','an','of','to','and','in','is')))
           * 20.0 / len(string_split(text, ' '))) AS BIGINT) AS bin
  FROM documents
  WHERE len(string_split(text, ' ')) > 0
),
cells AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM scored GROUP BY bin
),
idx AS (
  SELECT bin, n, pos,
         CAST(row_number() OVER (ORDER BY bin) - 1 AS BIGINT) AS rn,
         CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cum_n,
         CAST(sum(pos) OVER (ORDER BY bin) AS BIGINT) AS cum_pos
  FROM cells
),
m AS (SELECT max(rn) AS mx FROM idx),
ki AS (
  SELECT k.rn AS k, k.bin, k.n, k.pos, u.i AS i,
         li.cum_n - li.n AS nx, li.cum_pos - li.pos AS sx
  FROM idx k
  CROSS JOIN m
  JOIN UNNEST(generate_series(0, (SELECT mx FROM m))) AS u(i)
    ON u.i <= k.rn
  JOIN idx li ON li.rn = u.i
),
kij AS (
  SELECT ki.k, ki.bin, ki.n, ki.pos, ki.i,
         (rj.cum_pos - ki.sx) * 1.0 / (rj.cum_n - ki.nx) AS ratio
  FROM ki
  CROSS JOIN m
  JOIN UNNEST(generate_series(0, (SELECT mx FROM m))) AS v(j)
    ON v.j >= ki.k
  JOIN idx rj ON rj.rn = v.j
),
inner_min AS (
  SELECT k, bin, n, pos, i, min(ratio) AS mn
  FROM kij GROUP BY k, bin, n, pos, i
)
SELECT bin,
       n AS n_docs,
       round(pos * 1.0 / n, 6) AS raw_rate,
       round(max(mn), 6) AS iso_rate
FROM inner_min
GROUP BY bin, n, pos
ORDER BY bin
""",
)
def isotonic_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop = F.size(
        F.filter(
            toks,
            lambda t: t.isin("the", "a", "an", "of", "to", "and", "in", "is"),
        )
    )
    scored = docs.filter(F.size(toks) > 0).select(
        (F.col("lang") == "en").cast("long").alias("y"),
        F.round(stop * 20.0 / F.size(toks)).cast("long").alias("bin"),
    )
    cells = scored.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wrn = Window.orderBy("bin")
    idx = cells.select(
        "bin",
        "n",
        "pos",
        (F.row_number().over(wrn) - 1).cast("long").alias("rn"),
        F.sum("n").over(wcum).cast("long").alias("cum_n"),
        F.sum("pos").over(wcum).cast("long").alias("cum_pos"),
    )
    from f1_bigdata_pyspark_spark.utils import materialize

    idx = materialize(idx)  # tiny (<=21 rows), read three times below
    mx = idx.agg(F.max("rn").alias("mx"))
    ks = idx.select(
        F.col("rn").alias("k"), "bin", "n", "pos"
    ).crossJoin(F.broadcast(mx))
    ki = ks.select(
        "k", "bin", "n", "pos", "mx",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("k"))).alias("i"),
    ).join(
        idx.select(
            F.col("rn").alias("i"),
            (F.col("cum_n") - F.col("n")).alias("nx"),
            (F.col("cum_pos") - F.col("pos")).alias("sx"),
        ),
        "i",
    )
    kij = ki.select(
        "k", "bin", "n", "pos", "i", "nx", "sx",
        F.explode(F.sequence(F.col("k"), F.col("mx"))).alias("j"),
    ).join(
        idx.select(
            F.col("rn").alias("j"),
            F.col("cum_n").alias("nj"),
            F.col("cum_pos").alias("sj"),
        ),
        "j",
    )
    ratio = (F.col("sj") - F.col("sx")) * F.lit(1.0) / (
        F.col("nj") - F.col("nx")
    )
    inner_min = kij.groupBy("k", "bin", "n", "pos", "i").agg(
        F.min(ratio).alias("mn")
    )
    return (
        inner_min.groupBy("bin", "n", "pos")
        .agg(F.round(F.max("mn"), 6).alias("iso_rate"))
        .select(
            "bin",
            F.col("n").alias("n_docs"),
            F.round(F.col("pos") * 1.0 / F.col("n"), 6).alias("raw_rate"),
            "iso_rate",
        )
        .orderBy("bin")
    )
