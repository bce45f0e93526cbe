"""Deduplication operators for a training-data corpus.

Exact dedup is hash-groupBy (reference analog:
``src/ingest/deduplicate_laps.py:17-47`` — group on key, keep first). Near-dup
adds MinHash+LSH, SimHash and n-gram Jaccard.

Design note (learned the hard way): shingles are built relationally
(posexplode + window — codegen) and signatures as ONE collect_set per doc
followed by array-lambda minima (``minhash_signature_arrays``). Two
rejected shapes, both measured: N nested array-lambdas over the same
``split(text)`` expression re-evaluate the split per element and blow up
the Catalyst tree; and the N×-explode long form
(``minhash_signatures``, kept as the cross-checked reference
implementation) shuffles N·|shingles| rows where the array form shuffles
|docs|.

Scale notes (100 TB corpus):
- MinHash: the shingle window and signature aggregation are both keyed by
  doc — one exchange end-to-end. Banding and the bucket self-join only
  touch the signature table (#docs × N longs ≪ corpus). The signature
  table is materialized once and read three times — at full scale it'd be
  persisted columnar, the same trade.
- Exact n-gram Jaccard self-joins on shingles — quadratic in the worst case;
  at scale it is the *verifier* for LSH candidates, not the candidate
  generator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.functions.text import md5_long, tokens

# Affine-rehash modulus: 2^31 - 1 (prime). With xm < P and a_i < P every
# product stays under 2^62 — exact int64 arithmetic in any engine, no
# overflow, no engine-specific hash.
_P = 2_147_483_647
_A_SEED = 1_103_515_245  # classic LCG multiplier; a_i = A_SEED*(i+1) mod P
_B_STEP = 12_345
from f1_bigdata_pyspark_spark.utils import materialize


def exact_dedup_keep_first(
    df: DataFrame, key_cols: list[str], order_cols: list[Column]
) -> DataFrame:
    """Keep the first row per key under an explicit total order —
    deterministic dropDuplicates (reference semantics:
    ``deduplicate_laps.py:37-47``)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _raw_shingles(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """Non-distinct (doc, s) shingle stream.

    Built relationally (posexplode tokens → window lead → concat) rather than
    with an array-lambda over ``split(text)``: a lambda body referencing the
    split as a free variable re-evaluates the regex split per element (~3×
    tokens per doc — measured 13 ms/doc at 500-char docs), while the
    relational form splits once per row. A fully narrow variant (tokenize
    to an array column, then transform over an index sequence with
    element_at) avoids the doc-keyed exchange but measured ~2× SLOWER end
    to end at sf0.1 — higher-order array functions evaluate their lambda
    interpreted per element, while the window form stays inside codegen.
    The per-doc window is keyed by doc id, so it scales horizontally.

    The doc-keyed exchange the window needs is issued EXPLICITLY on the
    raw documents, before the token explode: (a) pre-explode rows are the
    smaller representation to shuffle (text once vs. every token carrying
    a doc key), and (b) an explicit partition count pins full parallelism
    for the md5/window stages — the planner-inserted exchange is
    AQE-coalesced by *byte* size (a few MB of text → 3 partitions),
    serializing the CPU-bound hashing work downstream of it (measured
    3x on the signature build at sf0.1). Every downstream doc-keyed op
    (window, collect_set groupBy) reuses this one exchange."""
    from pyspark.sql import Window

    par = docs.sparkSession.sparkContext.defaultParallelism
    tok = docs.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "t"),
    )
    w = Window.partitionBy("doc").orderBy("pos")
    parts = [F.col("t")] + [F.lead("t", j).over(w) for j in range(1, n)]
    return (
        tok.select(
            "doc",
            F.concat_ws(" ", *parts).alias("s"),
            parts[-1].alias("__last"),
        )
        .filter(F.col("__last").isNotNull())
        .select("doc", "s")
    )


def shingle_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct (doc, shingle) pairs — the exact-Jaccard input (set
    semantics need the true strings)."""
    return _raw_shingles(docs, id_col, text_col, n).distinct()


def shingle_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct (doc, xm) shingle HASHES for MinHash: hash to the portable
    60-bit value BEFORE the dedup, so the distinct shuffle moves (doc,
    int64) rows instead of (doc, string) — same signatures (h_i is a pure
    function of xm, and min over distinct-xm == min over distinct-s),
    roughly half the dedup shuffle bytes and visibly tighter sweep
    variance at sf0.1."""
    raw = _raw_shingles(docs, id_col, text_col, n)
    return raw.select("doc", (md5_long(F.col("s")) % _P).alias("xm")).distinct()


def raw_shingle_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct (doc, xm) shingle hashes in the RAW 60-bit md5 domain (no
    mod-P reduction). Use this when the hash is compared against an oracle
    that hashes in the same 60-bit domain (e.g. contamination checks):
    reducing mod P on one side only would turn a mod-P birthday collision
    into a cross-engine mismatch. ``shingle_hashes`` keeps the mod-P form
    because MinHash's affine rehash needs xm < P for overflow-free int64
    products."""
    raw = _raw_shingles(docs, id_col, text_col, n)
    return raw.select("doc", md5_long(F.col("s")).alias("xm")).distinct()


def minhash_signatures(xs: DataFrame, num_hashes: int = 32) -> DataFrame:
    """Long-form MinHash signature from a (doc, xm) shingle-hash table
    (``shingle_hashes``): one row per (doc, hash index) with the min over
    shingles of the i-th affine rehash h_i = (a_i · xm + b_i) mod P.
    Columns: doc, i, mh.

    Portable on purpose — every h_i is exact int64 arithmetic over md5, so
    a DuckDB oracle recomputes the identical signature (engine-private
    xxhash64 would force a rows-only check). Also cheaper: ONE string hash
    per shingle, then integer-only rehashes, instead of num_hashes string
    hashes.

    Long form on purpose: a wide ``agg(min_0 .. min_{N-1})`` compiles an
    N-wide codegen'd hash aggregate (~15 s janino compile measured at N=8 and
    N=32 alike), while explode-to-long keeps every stage narrow — N× the
    shuffled rows, but rows are 24 bytes and map-side combined."""
    # everything in BIGINT: A_SEED*(i+1) overflows int32, and a_i*xm needs
    # the full int64 range (products stay < 2^62 by construction)
    i = F.col("i").cast("long")
    a_i = (F.lit(_A_SEED).cast("long") * (i + 1)) % _P
    h = (a_i * F.col("xm") + F.lit(_B_STEP).cast("long") * i) % _P
    return (
        xs.select(
            "doc",
            "xm",
            F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("i"),
        )
        .select("doc", "i", h.alias("h"))
        .groupBy("doc", "i")
        .agg(F.min("h").alias("mh"))
    )


def minhash_signature_arrays(xs: DataFrame, num_hashes: int = 32) -> DataFrame:
    """(doc, sig) MinHash signatures as a ``num_hashes``-long array column,
    from a (doc, xm) shingle-hash stream (distinct or not: min over a
    multiset equals min over its set). Same portable affine rehash as
    ``minhash_signatures`` (h_i = (a_i·xm + b·i) mod P over md5 hashes —
    a DuckDB oracle recomputes it exactly).

    Dataflow: the codegen'd long form (explode i → hash-agg min) followed
    by one struct-sort array assembly — NOT per-doc array lambdas.
    Measured at sf0.1: collect_set + 32× ``transform``/``array_min``
    costs ~1.0 s warm because higher-order array functions evaluate their
    lambdas interpreted per element (32 × |shingles| interpreted ops),
    while the explode form stays inside whole-stage codegen end to end
    (~0.7 s warm, identical signatures). Shuffle cost is unchanged: the
    partial min reduces each partition to ≤ num_hashes rows per doc
    before any exchange, and on an input already hash-partitioned by doc
    (the shingle window's layout) BOTH aggregations satisfy their
    clustering requirement from that one partitioning — the whole build
    adds no exchange at all."""
    mins = minhash_signatures(xs, num_hashes)
    return (
        mins.groupBy("doc")
        .agg(F.array_sort(F.collect_list(F.struct("i", "mh"))).alias("p"))
        .select("doc", F.col("p.mh").alias("sig"))
    )


def band_table(
    sig: DataFrame, n_bands: int, rows_per_band: int
) -> DataFrame:
    """(doc, band, bucket) from a (doc, sig) signature table: band bucket =
    md5 of the band's min-hashes in index order (md5, not xxhash64, so an
    oracle computes the identical bucket). The banded index is the
    PERSISTED state of an incremental near-dup pipeline — signatures of
    new documents band into the same buckets regardless of when they
    arrive, so the index is append-only."""
    return sig.select(
        "doc",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
        F.col("sig"),
    ).select(
        "doc",
        "band",
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(
                        F.col("sig"),
                        F.col("band") * rows_per_band + 1,
                        rows_per_band,
                    ),
                    lambda m: m.cast("string"),
                ),
            )
        ).alias("bucket"),
    )


def minhash_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    n_bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash+LSH near-dup candidates: band the signature, bucket-join docs
    sharing any band, estimate Jaccard as the fraction of matching signature
    positions. Columns: d1, d2, est_jaccard."""
    rows_per_band = num_hashes // n_bands
    # One signature table, materialized once, read three times (band build +
    # both sides of the verify join) — the production shape would persist it
    # columnar; localCheckpoint is the local-mode stand-in for that persist.
    # The RAW hash stream feeds the signature build (collect_set dedups
    # inside the aggregation) — a separate distinct would add an exchange.
    raw_hashes = _raw_shingles(docs, id_col, text_col, shingle_n).select(
        "doc", (md5_long(F.col("s")) % _P).alias("xm")
    )
    sig = materialize(minhash_signature_arrays(raw_hashes, num_hashes))
    band_sig = band_table(sig, n_bands, rows_per_band)
    pairs = (
        band_sig.alias("x")
        .join(band_sig.alias("y"), ["band", "bucket"])
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("d1"), F.col("y.doc").alias("d2"))
        .dropDuplicates()
    )
    # Verify joins under the size policy: the signature table (#docs × 32
    # longs) broadcasts while it fits the threshold — removing two shuffle
    # joins — and degrades to a co-partitioned join at corpus scale where
    # it no longer does.
    from f1_bigdata_pyspark_spark.operators.join_policy import (
        broadcast_if_small,
    )

    s1 = broadcast_if_small(
        sig.select(F.col("doc").alias("d1"), F.col("sig").alias("sig1"))
    )
    s2 = broadcast_if_small(
        sig.select(F.col("doc").alias("d2"), F.col("sig").alias("sig2"))
    )
    n_match = F.aggregate(
        F.zip_with("sig1", "sig2", lambda a, b: (a == b).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        pairs.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            F.round(
                n_match.cast("double") / F.lit(float(num_hashes)), 6
            ).alias("est_jaccard"),
        )
    )


SIMHASH_BITS = 60  # width of the portable md5-derived hash


def simhash_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """60-bit SimHash per doc: per-bit ±1 majority votes over token hashes,
    sign bits folded back with a bit_or aggregate. Columns: doc, simhash.

    The token hash is the portable 60-bit md5-derived integer
    (``functions.text.md5_long``) so a DuckDB oracle reproduces the exact
    simhash — bit for bit — instead of settling for a rows-only check.

    Long form (explode bits → two narrow groupBys) for the same reason as
    ``minhash_signatures`` — a 64-wide conditional-sum aggregate is
    codegen-compile-bound. The hash is 60 bits and non-negative, so
    shiftright needs no unsigned variant and the bit_or fold never sees a
    sign bit."""
    tok = docs.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("t")
    )
    bits = tok.select(
        "doc",
        md5_long(F.col("t")).alias("h"),
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("b"),
    )
    votes = bits.groupBy("doc", "b").agg(
        F.sum(
            F.when(F.expr("shiftright(h, b) & 1") == 1, 1).otherwise(-1)
        ).alias("v")
    )
    return votes.groupBy("doc").agg(
        F.bit_or(
            F.when(
                F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact word-n-gram Jaccard near-dup pairs (d1 < d2, jaccard >= thr).
    Ground-truth verifier for the LSH candidates; oracle-checkable in SQL."""
    sh = materialize(shingle_table(docs, id_col, text_col, shingle_n))
    counts = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), F.col("a.s") == F.col("b.s"))
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("d1"), F.col("b.doc").alias("d2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ca = counts.select(F.col("doc").alias("d1"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc").alias("d2"), F.col("n").alias("nb"))
    jac = F.col("c").cast("double") / (
        F.col("na") + F.col("nb") - F.col("c")
    ).cast("double")
    return (
        inter.join(ca, "d1")
        .join(cb, "d2")
        .filter(jac >= threshold)
        .select("d1", "d2", F.round(jac, 6).alias("jaccard"))
    )


def positioned_shingle_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 8
) -> DataFrame:
    """Non-distinct (doc, i, xm): every n-token window WITH its 1-based
    start position — the rewrite form of ``raw_shingle_hashes`` (mapping a
    flagged fingerprint back to the exact token span it covers needs the
    position, which the distinct doc×hash table deliberately drops). Same
    relational build and explicit doc-keyed exchange as ``_raw_shingles``;
    the extra int column adds nothing to the shuffle that matters."""
    from pyspark.sql import Window

    par = docs.sparkSession.sparkContext.defaultParallelism
    tok = docs.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "t"),
    )
    w = Window.partitionBy("doc").orderBy("pos")
    parts = [F.col("t")] + [F.lead("t", j).over(w) for j in range(1, n)]
    return (
        tok.select(
            "doc",
            (F.col("pos") + 1).alias("i"),
            F.concat_ws(" ", *parts).alias("s"),
            parts[-1].alias("__last"),
        )
        .filter(F.col("__last").isNotNull())
        .select("doc", "i", md5_long(F.col("s")).alias("xm"))
    )
