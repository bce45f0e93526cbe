"""Byte-pair-encoding merge training, unrolled k rounds — tokenizer
induction as relational dataflow.

Reference scope: the reference engine has no tokenizer training; this is
LLM-pipeline extension scope (SURVEY.md §2 north-star list) completing the
story `bpe_pair_merge_candidates` starts: not just the FIRST merge
candidate table, but k successive merges actually APPLIED to the vocab,
the loop every BPE trainer (sentencepiece, GPT-2 bpe) runs.

The scale discipline is the same one every BPE trainer uses, made
distributed: collapse the corpus to the DISTINCT-word frequency table
first (Zipf: vocab ≪ corpus), then every round is vocab-sized work —
pair counting, argmax, merge application never touch the corpus again.
Rounds are loop-unrolled like PageRank/k-core (`queries/joins.py`), with
a localCheckpoint per round so round r+1's plan doesn't recompute round r
twice, and the per-round argmax surfaces as a k-row driver-side constant
(``as_local_dim``) exactly like PageRank's node count.

Merge semantics (the subtle part, pinned by tests): one round replaces
all LEFTMOST-GREEDY NON-OVERLAPPING occurrences of the top pair (A, B).
Overlap is only possible when A = B (runs of the same symbol), where the
greedy walk merges positions 1-2, 3-4, ... of each run. Relationally:
rank each match within its maximal run of CONSECUTIVE match positions
and merge the odd ranks — windows over (word, run), no sequential fold,
no UDF, identical in any engine with window functions (the DuckDB oracle
replays it verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.operators.join_policy import as_local_dim
from f1_bigdata_pyspark_spark.utils import materialize


def initial_word_symbols(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(wid, freq, syms): the distinct-word frequency table with each word
    split to single-character symbols — BPE's round-0 state. The ONLY
    corpus-sized pass in the whole training loop (one tokenize +
    groupBy(word) shuffle)."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("wid")
        )
        .filter(F.length("wid") >= 2)
        .groupBy("wid")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("wid", "freq", F.split("wid", "").alias("syms"))
    )


def bpe_round(words: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One BPE merge round over the (wid, freq, syms) state: count adjacent
    symbol pairs weighted by word frequency, pick the top pair
    (count desc, then lexicographic — deterministic across engines), and
    apply it leftmost-greedy to every word. Returns (merged_state,
    top_pair_row); the top-pair frame is a 1-row LocalRelation (driver
    probe bounded by the round count, the PageRank-n pattern) with
    columns (left_sym, right_sym, merged, n_occurrences)."""
    w = Window.partitionBy("wid").orderBy("i")
    pos = words.select(
        "wid", "freq", F.posexplode("syms").alias("i", "s")
    ).withColumn("s2", F.lead("s").over(w))
    counts = (
        pos.filter(F.col("s2").isNotNull())
        .groupBy("s", "s2")
        .agg(F.sum("freq").alias("cnt"))
    )
    top = as_local_dim(
        counts.orderBy(F.col("cnt").desc(), "s", "s2")
        .limit(1)
        .select(
            F.col("s").alias("left_sym"),
            F.col("s2").alias("right_sym"),
            F.concat("s", "s2").alias("merged"),
            F.col("cnt").cast("long").alias("n_occurrences"),
        )
    )
    if not top.take(1):
        # CONVERGED: no adjacent pair left to merge (every word is a
        # single symbol). The crossJoin below would be empty and silently
        # WIPE the whole vocabulary state — return it unchanged with the
        # empty top row instead (driver probe on a LocalRelation, free).
        return words, top
    flagged = pos.crossJoin(
        F.broadcast(top.select("left_sym", "right_sym", "merged"))
    ).withColumn(
        "match",
        (F.col("s") == F.col("left_sym")) & (F.col("s2") == F.col("right_sym")),
    )
    # maximal runs of CONSECUTIVE match positions: run id = number of
    # non-match rows STRICTLY before this row; rank matches within the run
    # and merge odd ranks (overlap exists only when left=right; isolated
    # matches rank 1 and always merge)
    strictly_before = w.rowsBetween(Window.unboundedPreceding, -1)
    run_frame = Window.partitionBy("wid", "run").orderBy("i").rowsBetween(
        Window.unboundedPreceding, 0
    )
    flagged = (
        flagged.withColumn(
            "run",
            F.coalesce(
                F.sum((~F.col("match")).cast("int")).over(strictly_before),
                F.lit(0),
            ),
        )
        .withColumn(
            "mrank", F.sum(F.col("match").cast("int")).over(run_frame)
        )
        .withColumn("merge", F.col("match") & (F.col("mrank") % 2 == 1))
        .withColumn("consumed", F.coalesce(F.lag("merge").over(w), F.lit(False)))
    )
    merged_state = (
        flagged.filter(~F.col("consumed"))
        .select(
            "wid",
            "freq",
            "i",
            F.when(F.col("merge"), F.col("merged")).otherwise(F.col("s")).alias(
                "sym"
            ),
        )
        # (r12 examined: keying this groupBy by wid alone so the next
        # round's per-word window could reuse the state's partitioning
        # was tried and MEASURED FLAT — localCheckpoint on this build
        # plans a fresh Exchange over the Scan ExistingRDD regardless
        # (output partitioning is not preserved through the checkpoint),
        # so each round pays one vocab-sized exchange either way. A full
        # warm round is 0.92 s, dominated by sequential argmax+merge job
        # latency on vocab-sized data — the loop-unrolled trainer shape
        # this operator declares.)
        .groupBy("wid", "freq")
        .agg(F.array_sort(F.collect_list(F.struct("i", "sym"))).alias("p"))
        .select("wid", "freq", F.col("p.sym").alias("syms"))
    )
    return materialize(merged_state), top


def bpe_apply(docs: DataFrame, rounds: int = 4) -> DataFrame:
    """The vocabulary AFTER ``rounds`` merges: (wid, freq, syms) — the
    encoder's view of every word once the learned merges are applied.
    Same unrolled loop as ``bpe_merge_table``; exposed separately so the
    corpus-compression readout can aggregate the end state."""
    state = materialize(initial_word_symbols(docs))
    for _ in range(rounds):
        state, _top = bpe_round(state)
    return state


def bpe_merge_table(docs: DataFrame, rounds: int = 4) -> DataFrame:
    """The induced merge table after ``rounds`` BPE rounds: one row per
    round — (round, left_sym, right_sym, merged, n_occurrences), the
    artifact a tokenizer ships. Union of k 1-row LocalRelations; the
    heavy lifting happened in the bounded per-round dataflow above."""
    state = materialize(initial_word_symbols(docs))
    outs = []
    for r in range(1, rounds + 1):
        state, top = bpe_round(state)
        outs.append(top.select(F.lit(r).cast("long").alias("round"), "*"))
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result
