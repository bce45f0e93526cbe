"""Property-based tests (hypothesis) for the numeric/semantic helpers the
oracle comparisons lean on. Few examples, one Spark job each — property
breadth over example count.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from f1_bigdata_pyspark_spark.functions.stats import (
    slope_from_stats,
    slope_sufficient_stats,
)
from f1_bigdata_pyspark_spark.sources.parquet import upsert_keep_latest

_xy = st.lists(
    st.tuples(
        st.floats(-1e3, 1e3, allow_nan=False, width=32),
        st.floats(-1e3, 1e3, allow_nan=False, width=32),
    ),
    min_size=2,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(_xy)
def test_slope_matches_numpy_polyfit(spark, pts):
    """Sufficient-statistics slope == numpy least-squares slope (or NULL
    exactly when var(x) == 0)."""
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], ["x", "y"]
    )
    from pyspark.sql import functions as F

    stats = slope_sufficient_stats(F.col("x"), F.col("y"))
    row = (
        df.agg(*stats.values())
        .select(
            slope_from_stats(
                F.col("avg_x"), F.col("avg_y"), F.col("avg_xy"), F.col("avg_xx")
            ).alias("slope")
        )
        .first()
    )
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    if np.var(xs) == 0.0:
        assert row.slope is None
    else:
        want = float(np.polyfit(xs, ys, 1)[0])
        assert row.slope is not None
        assert math.isclose(row.slope, want, rel_tol=1e-6, abs_tol=1e-6)


_batches = st.lists(
    st.lists(
        st.tuples(
            st.integers(0, 5),  # key
            st.integers(0, 100),  # payload
        ),
        min_size=0,
        max_size=8,
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=8, deadline=None)
@given(_batches)
def test_upsert_keep_latest_properties(spark, batches):
    """The parquet upsert (reference's Mongo $set-upsert semantics): after
    any batch sequence, (a) keys are unique, (b) each key holds the payload
    of its LAST write across all batches, (c) re-applying the final batch is
    idempotent."""
    state = None
    seq = 0
    last_write: dict[int, int] = {}
    final_batch = None
    for batch in batches:
        rows = []
        for k, v in batch:
            rows.append((k, v, seq))
            last_write[k] = v
            seq += 1
        final_batch = spark.createDataFrame(
            rows, ["key", "payload", "ingested_at"]
        ) if rows else None
        if final_batch is None:
            continue
        state = upsert_keep_latest(state, final_batch, ["key"], "ingested_at")
    if state is None:
        return
    got = {r.key: r.payload for r in state.collect()}
    assert got == last_write  # uniqueness + keep-latest
    if final_batch is not None:
        again = upsert_keep_latest(state, final_batch, ["key"], "ingested_at")
        assert {r.key: r.payload for r in again.collect()} == last_write


_edges = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)),  # self-loops included
    min_size=1,
    max_size=25,
)


@settings(max_examples=6, deadline=None)
@given(_edges)
def test_connected_components_match_union_find(spark, edges):
    """Distributed large-star/small-star CC == a driver-side union-find on
    arbitrary random graphs including self-loops (same node set, same
    partition, min-id label)."""
    from f1_bigdata_pyspark_spark.operators.graph import connected_components

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "d1 long, d2 long"
    )
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: dict[int, list[int]] = {}
    for node in parent:
        groups.setdefault(find(node), []).append(node)
    want = {n: min(members) for members in groups.values() for n in members}
    assert got == want


# --------------------------------------------------------------------------
# Bloom pre-filter: NO false negatives — every key on the build side must
# pass might_contain on the probe side (false positives are fine; they are
# removed by the exact join downstream).
# --------------------------------------------------------------------------
_keys = st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200)


@settings(max_examples=6, deadline=None)
@given(_keys)
def test_bloom_prefilter_no_false_negatives(spark, keys):
    from pyspark.sql import functions as F

    from f1_bigdata_pyspark_spark.functions.text import md5_long

    BITS_PER_WORD = 64
    N_BITS, K = 4096, 3
    N_WORDS = N_BITS // BITS_PER_WORD

    def probes(key):
        return [
            md5_long(F.concat_ws("#", key.cast("string"), F.lit(i))) % N_BITS
            for i in range(K)
        ]

    df = spark.createDataFrame([(k,) for k in set(keys)], ["k"])
    words_rows = (
        df.select(F.explode(F.array(*probes(F.col("k")))).alias("bitpos"))
        .select(
            (F.col("bitpos") / BITS_PER_WORD).cast("int").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(bitpos % {BITS_PER_WORD} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    bloom = [0] * N_WORDS
    for r in words_rows:
        bloom[r["word"]] = r["bits"]
    arr = F.array(*[F.lit(w).cast("long") for w in bloom])
    probe_df = df
    for i, p in enumerate(probes(F.col("k"))):
        probe_df = probe_df.withColumn(f"bp{i}", p)
    cond = None
    for i in range(K):
        word = (F.col(f"bp{i}") / BITS_PER_WORD).cast("int")
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(bp{i} % {BITS_PER_WORD} AS INT))"
        )
        hit = F.element_at(arr, word + 1).bitwiseAND(mask) != 0
        cond = hit if cond is None else (cond & hit)
    assert probe_df.filter(~cond).count() == 0


# --------------------------------------------------------------------------
# Bottom-k sampling merge identity: min-k of per-partition min-k's equals
# the global min-k, for ANY partition assignment (the mergeability that
# makes bottom-k a distributed sampling sketch).
# --------------------------------------------------------------------------
_ids_parts = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**6),
        st.integers(min_value=0, max_value=5),
    ),
    min_size=1,
    max_size=300,
)


@settings(max_examples=6, deadline=None)
@given(_ids_parts)
def test_bottomk_merge_identity(spark, rows):
    import hashlib

    k = 8
    uniq = {}
    for key, part in rows:
        uniq.setdefault(key, part)

    def prio(key):
        return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)

    direct = sorted(uniq, key=lambda x: (prio(x), x))[:k]
    per_part: dict[int, list] = {}
    for key, part in uniq.items():
        per_part.setdefault(part, []).append(key)
    merged_pool = [
        x
        for part_keys in per_part.values()
        for x in sorted(part_keys, key=lambda x: (prio(x), x))[:k]
    ]
    merged = sorted(merged_pool, key=lambda x: (prio(x), x))[:k]
    assert merged == direct


# --------------------------------------------------------------------------
# UDTF chunking is a partition of the token stream: concatenating chunks in
# index order reconstructs the document exactly, and every chunk except the
# last is full-size.
# --------------------------------------------------------------------------
_texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c"),
        min_size=0,
        max_size=200,
    ),
    min_size=1,
    max_size=5,
)


@settings(max_examples=6, deadline=None)
@given(_texts)
def test_udtf_chunks_reconstruct_document(spark, texts):
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, chunk_idx: int, n_tokens: bigint, chunk: string")
    class ChunkText:
        def eval(self, doc_id, text):
            toks = text.split(" ")
            for i in range(0, (len(toks) + 31) // 32):
                chunk = toks[i * 32 : (i + 1) * 32]
                yield doc_id, i, len(chunk), " ".join(chunk)

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    df.createOrReplaceTempView("prop_docs")
    spark.udtf.register("chunk_text_prop", ChunkText)
    got = spark.sql(
        "SELECT c.* FROM prop_docs, LATERAL chunk_text_prop(doc_id, text) c"
    ).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in rows:
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        assert " ".join(c["chunk"] for c in chunks) == text
        for c in chunks[:-1]:
            assert c["n_tokens"] == 32


# ------------------------------------------------------------------ asof join
_asof_probes = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=20
)
_asof_states = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=20
)


@settings(max_examples=6, deadline=None)
@given(_asof_probes, _asof_states)
def test_asof_join_matches_pandas_merge_asof(spark, probes, states):
    """The union+window as-of join (both directions) == pandas.merge_asof
    (an independent reference implementation) on arbitrary random
    key/timestamp sets, including duplicate probe timestamps and exact
    ties."""
    import datetime as dt

    import pandas as pd
    from pyspark.sql import functions as F

    from f1_bigdata_pyspark_spark.operators.asof import (
        asof_join_backward,
        asof_join_forward,
    )

    base = dt.datetime(2026, 1, 1)
    to_ts = lambda m: base + dt.timedelta(minutes=m)  # noqa: E731
    p_rows = [(k, to_ts(m)) for k, m in probes]
    s_rows = sorted({(k, to_ts(m)) for k, m in states})  # unique per (key, ts)

    pdf = spark.createDataFrame(p_rows, "k long, ts timestamp")
    sdf = spark.createDataFrame(
        s_rows, "k long, ts timestamp"
    ).withColumn("state_ts", F.col("ts"))
    pd_p = pd.DataFrame(p_rows, columns=["k", "ts"]).sort_values("ts")
    pd_s = (
        pd.DataFrame(s_rows, columns=["k", "state_ts"])
        .sort_values("state_ts")
    )
    for direction, fn in (
        ("backward", asof_join_backward),
        ("forward", asof_join_forward),
    ):
        got = sorted(
            (r["k"], r["ts"], r["state_ts"])
            for r in fn(pdf, sdf, "k", "ts", ["state_ts"]).collect()
        )
        merged = pd.merge_asof(
            pd_p, pd_s, left_on="ts", right_on="state_ts", by="k",
            direction=direction, allow_exact_matches=True,
        )
        want = sorted(
            (int(r.k), r.ts.to_pydatetime(),
             None if pd.isna(r.state_ts) else r.state_ts.to_pydatetime())
            for r in merged.itertuples()
        )
        assert got == want, direction


# --------------------------------------------------------------------------
# Snapshot CDC: applying the diff to the FROM version reconstructs the TO
# version exactly (sources/snapshots.snapshot_diff) — the invariant an
# incremental consumer of the change feed relies on.
# --------------------------------------------------------------------------
_cdc_tables = st.tuples(
    st.dictionaries(  # v0: key -> value
        st.integers(min_value=0, max_value=8),
        st.one_of(st.none(), st.text(alphabet="ab", max_size=2)),
        max_size=8,
    ),
    st.dictionaries(  # v1
        st.integers(min_value=0, max_value=8),
        st.one_of(st.none(), st.text(alphabet="ab", max_size=2)),
        max_size=8,
    ),
)


@settings(max_examples=10, deadline=None)
@given(_cdc_tables)
def test_snapshot_diff_roundtrip(spark, tmp_path_factory, tables):
    from f1_bigdata_pyspark_spark.sources.snapshots import (
        SnapshotTable,
        snapshot_diff,
    )

    v0, v1 = tables
    root = tmp_path_factory.mktemp("cdc")
    tbl = SnapshotTable(str(root / "t"))
    tbl.commit(
        spark.createDataFrame(sorted(v0.items()) or [(None, None)],
                              "k int, v string").filter("k is not null"),
        mode="append",
    )
    tbl.commit(
        spark.createDataFrame(sorted(v1.items()) or [(None, None)],
                              "k int, v string").filter("k is not null"),
        mode="overwrite",
    )
    diff = {
        r.k: (r.change_type, r.row.v)
        for r in snapshot_diff(spark, tbl, 0, 1, ["k"]).collect()
    }
    # replay: v0 + diff == v1
    replayed = dict(v0)
    for k, (ct, v) in diff.items():
        if ct == "delete":
            replayed.pop(k)
        else:  # insert or update carry the NEW row
            replayed[k] = v
    assert replayed == v1
    # no spurious entries: unchanged keys never appear
    for k in set(v0) & set(v1):
        if v0[k] == v1[k]:
            assert k not in diff


# --------------------------------------------------------------------------
# Degree-oriented triangle counting equals the naive unoriented count
# (every triangle counted exactly once regardless of orientation) on
# random graphs — the invariant behind supplier_graph_triangles.
# --------------------------------------------------------------------------
_rand_edges = st.sets(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ).filter(lambda e: e[0] != e[1]),
    max_size=25,
)


def test_triangle_missed_by_id_ordered_wedge_filter(spark):
    # triangle {0,5,2} with deg(2) raised: the closing edge orients 5->2
    # (degree order) while an id-ordered wedge filter keeps only (2,5) —
    # the counterexample that showed d1 < d2 undercounts; the shipped
    # ordered-wedge form (d1 <> d2) must count exactly 1
    edges = {(0, 5), (0, 2), (2, 5), (2, 7), (2, 8)}
    assert _spark_triangles(spark, edges) == 1


def _spark_triangles(spark, edges) -> int:
    """Degree-oriented triangle count, same dataflow as
    queries/joins.supplier_graph_triangles (ordered wedges d1 <> d2)."""
    und = {tuple(sorted(e)) for e in edges}
    if not und:
        return 0
    adj: dict[int, set[int]] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {n: len(adj[n]) for n in adj}
    ori = [(u, v) if (deg[u], u) < (deg[v], v) else (v, u) for u, v in und]
    df = spark.createDataFrame(ori, "src int, dst int")
    from pyspark.sql import functions as F

    e1 = df.select(F.col("src").alias("s"), F.col("dst").alias("d1"))
    e2 = df.select(F.col("src").alias("s"), F.col("dst").alias("d2"))
    wedges = e1.join(e2, "s").filter(F.col("d1") != F.col("d2"))
    closing = df.select(F.col("src").alias("d1"), F.col("dst").alias("d2"))
    return wedges.join(closing, ["d1", "d2"]).count()


@settings(max_examples=10, deadline=None)
@given(_rand_edges)
def test_degree_oriented_triangle_count_matches_naive(spark, edges):
    from itertools import combinations

    und = {tuple(sorted(e)) for e in edges}
    adj: dict[int, set[int]] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expected = sum(
        1
        for a, b, c in combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    assert _spark_triangles(spark, edges) == expected


@settings(max_examples=6, deadline=None)
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["append", "raced_append"]),
            st.lists(
                st.integers(min_value=0, max_value=99),
                min_size=1,
                max_size=4,
            ),
            st.lists(
                st.integers(min_value=100, max_value=199),
                min_size=1,
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_concurrency_protocol_model(spark, tmp_path_factory, ops):
    """Model-based check of the round-7 rebase protocol: a random op
    sequence of plain appends and RACED appends (loser configured with
    on_conflict='rebase', winner injected at publish time) must preserve
    the full multiset of rows, keep history all-append, and leave one
    manifest per logical commit — no lost writers, no forked history."""
    from f1_bigdata_pyspark_spark.sources.snapshots import SnapshotTable

    tmp = tmp_path_factory.mktemp("ccmodel")
    table = SnapshotTable(str(tmp / "t"))
    expected: list[int] = []
    n_commits = 0
    for kind, loser_keys, winner_keys in ops:
        loser = spark.createDataFrame([(k,) for k in loser_keys], "k long")
        if kind == "append":
            table.commit(loser.coalesce(1), mode="append")
            expected += loser_keys
            n_commits += 1
        else:
            winner = spark.createDataFrame(
                [(k,) for k in winner_keys], "k long"
            )
            table.commit(
                loser.coalesce(1),
                mode="append",
                on_conflict="rebase",
                _before_publish=lambda w=winner: table.commit(
                    w.coalesce(1), mode="append"
                ),
            )
            expected += winner_keys + loser_keys
            n_commits += 2
    got = sorted(r.k for r in table.read(spark).collect())
    assert got == sorted(expected)
    hist = table.history()
    assert len(hist) == n_commits
    assert all(h["mode"] == "append" for h in hist)


# ------------------------------------------------- hidden partitioning
# soundness + metadata exactness (round 8): random rows under a
# day(ts) x bucket(B,k) hidden layout, random predicate — pruning must
# never drop a matching row, and metadata_count must be exact or None.

_hp_rows = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),  # k
        st.one_of(
            st.none(), st.integers(min_value=0, max_value=4)
        ),  # day offset (None -> NULL ts)
    ),
    min_size=1,
    max_size=30,
)
_hp_pred = st.tuples(
    st.sampled_from(["k", "ts"]),
    st.sampled_from(["=", "<", "<=", ">", ">=", "is_null", "is_not_null"]),
    st.integers(min_value=-50, max_value=50),  # literal seed
)


@settings(max_examples=10, deadline=None)
@given(_hp_rows, _hp_pred, st.integers(min_value=1, max_value=5))
def test_hidden_partition_prune_sound_and_metadata_exact(
    spark, tmp_path_factory, rows, pred, buckets
):
    import datetime

    from f1_bigdata_pyspark_spark.sources.snapshots import SnapshotTable

    d0 = datetime.datetime(2024, 3, 1)
    data = [
        (
            k,
            None
            if off is None
            else d0 + datetime.timedelta(days=off, hours=k % 24),
        )
        for k, off in rows
    ]
    df = spark.createDataFrame(data, "k long, ts timestamp").repartition(1)
    t = SnapshotTable(
        str(tmp_path_factory.mktemp("hp") / "tbl")
    )
    t.commit(
        df,
        mode="append",
        partition_by=["day(ts)", f"bucket({buckets},k)"],
    )
    col, op, seed = pred
    if op in ("is_null", "is_not_null"):
        lit = None
    elif col == "k":
        lit = seed
    else:
        lit = d0 + datetime.timedelta(hours=seed)
    where = [(col, op, lit)]

    def sat(k, ts):
        v = k if col == "k" else ts
        if op == "is_null":
            return v is None
        if op == "is_not_null":
            return v is not None
        if v is None:
            return False
        return {
            "=": v == lit,
            "<": v < lit,
            "<=": v <= lit,
            ">": v > lit,
            ">=": v >= lit,
        }[op]

    def canon(pairs):
        # ties on k can compare a None ts against a datetime — sort on a
        # None-safe key (the VALUES still compare exactly via ==)
        return sorted(pairs, key=lambda t: (t[0], t[1] is None, str(t[1])))

    truth = canon((k, ts) for k, ts in data if sat(k, ts))
    got = canon(
        (r.k, r.ts) for r in t.read(spark, where=where).collect()
    )
    assert got == truth  # pruning never changed the answer
    mc = t.metadata_count(where=where)
    assert mc is None or mc == len(truth)  # exact or refused, never wrong
    mm = t.metadata_min_max("ts")
    nn = [ts for _, ts in data if ts is not None]
    if mm is not None:
        assert mm == ((min(nn), max(nn)) if nn else (None, None))


# ------------------------------------------------------- predicate DML
# (round 8): random table, random delete/update predicate — the
# copy-on-write rewrite must equal the row-level ground truth, including
# NULL-predicate semantics and carry-by-identity file accounting.

_dml_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # k
        st.one_of(st.none(), st.integers(min_value=-20, max_value=20)),
    ),
    min_size=1,
    max_size=25,
)
_dml_pred = st.tuples(
    st.sampled_from(["k", "val"]),
    st.sampled_from(["=", "<", ">="]),
    st.integers(min_value=-20, max_value=30),
)


@settings(max_examples=8, deadline=None)
@given(_dml_rows, _dml_pred, st.booleans())
def test_predicate_dml_matches_ground_truth(
    spark, tmp_path_factory, rows, pred, do_update
):
    from pyspark.sql import functions as F

    from f1_bigdata_pyspark_spark.sources.snapshots import SnapshotTable

    data = [(i, k, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "rid long, k long, val long"
    ).repartition(1)
    t = SnapshotTable(str(tmp_path_factory.mktemp("dml") / "tbl"))
    t.commit(df, mode="append", partition_by=["bucket(3,k)"])
    col, op, lit = pred

    def sat(row):
        v = row[1] if col == "k" else row[2]
        if v is None:
            return False  # NULL predicate: never TRUE
        return {"=": v == lit, "<": v < lit, ">=": v >= lit}[op]

    where = [(col, op, lit)]
    if do_update:
        rep = t.update_where(spark, {"val": F.lit(999)}, where)
        truth = sorted(
            (rid, k, 999 if sat((rid, k, v)) else v)
            for rid, k, v in data
        )
    else:
        rep = t.delete_where(spark, where)
        truth = sorted(r for r in data if not sat(r))
    got = sorted(
        (r.rid, r.k, r.val) for r in t.read(spark).collect()
    )
    assert got == truth
    assert rep["rows_changed"] == sum(1 for r in data if sat(r))
    # file accounting is conservative-exact: rewritten + carried covers
    # the pre-DML file set
    m0 = t._read_manifest(0)
    assert rep["files_rewritten"] + rep["files_carried"] == len(m0["files"])


# ------------------------------------------------ adversarial stats
# ladder (round 9): random rows whose STRING values cross every writer
# truncation threshold (>16 KB) and whose FLOATS include NaN/±inf —
# harvest + exact overlay -> _file_may_match/_file_all_match must stay
# sound under SPARK comparison semantics (NaN orders above everything),
# and the metadata aggregates must be exact or refused, never wrong.

_adv_string = st.one_of(
    st.none(),
    st.text(alphabet="abz", max_size=8),
    st.builds(
        lambda head, n: head + "q" * n,
        st.text(alphabet="abz", min_size=1, max_size=4),
        st.integers(min_value=5_000, max_value=20_001),
    ),
)
_adv_float = st.one_of(
    st.none(),
    st.floats(-100.0, 100.0, allow_nan=False),
    st.sampled_from(
        [float("nan"), float("inf"), float("-inf")]
    ),
)
_adv_rows = st.lists(
    st.tuples(_adv_string, _adv_float), min_size=1, max_size=12
)
_adv_ops = st.sampled_from(["=", "<", "<=", ">", ">=", "is_null", "is_not_null"])


def _spark_sat(v, op, lit):
    """Spark's three-valued comparison truth for one value (strings via
    binary collation == Python code points; floats via Spark's total
    order where NaN is greatest and NaN = NaN is TRUE)."""
    if op == "is_null":
        return v is None
    if op == "is_not_null":
        return v is not None
    if v is None:
        return False
    if isinstance(v, float) and math.isnan(v):
        if isinstance(lit, float) and math.isnan(lit):
            return op in ("=", "<=", ">=")
        return op in (">", ">=")
    if isinstance(lit, float) and math.isnan(lit):
        return op in ("<", "<=")  # every non-NaN orders below NaN
    return {
        "=": v == lit,
        "<": v < lit,
        "<=": v <= lit,
        ">": v > lit,
        ">=": v >= lit,
    }[op]


@settings(max_examples=30, deadline=None)
@given(
    _adv_rows,
    st.sampled_from(["s", "x"]),
    _adv_ops,
    st.integers(min_value=0, max_value=10_000),
)
def test_stats_ladder_sound_under_adversarial_values(
    tmp_path_factory, rows, col, op, seed
):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from f1_bigdata_pyspark_spark.sources.snapshots import (
        _exact_stats_overlay,
        _file_all_match,
        _file_column_stats,
        _file_may_match,
    )

    p = str(tmp_path_factory.mktemp("adv") / "t.parquet")
    tbl = pa.table(
        {
            "s": pa.array([r[0] for r in rows], type=pa.string()),
            "x": pa.array([r[1] for r in rows], type=pa.float64()),
        }
    )
    pq.write_table(tbl, p)
    stats = _file_column_stats(p)
    _exact_stats_overlay(stats, tbl)
    vals = [r[0] if col == "s" else r[1] for r in rows]
    # literal pool: values present (prefix-perturbed), plus seeded ones
    if col == "s":
        lits = ["", "a", "q" * (seed % 30), "z" * 17_000]
        lits += [v[: seed % 50 + 1] for v in vals if v]
    else:
        lits = [
            float(seed % 100) - 50.0,
            float("nan"),
            float("inf"),
            float("-inf"),
        ] + [v for v in vals if v is not None]
    for lit in lits:
        if op in ("is_null", "is_not_null"):
            lit = None
        truth = [_spark_sat(v, op, lit) for v in vals]
        if not _file_may_match(stats, col, op, lit):
            assert not any(truth), (
                f"unsound prune: {col} {op} {lit!r} over {vals!r}"
            )
        if _file_all_match(stats, col, op, lit):
            assert all(truth), (
                f"unsound all-match: {col} {op} {lit!r} over {vals!r}"
            )
        if op in ("is_null", "is_not_null"):
            break  # literal-independent: one round suffices


@settings(max_examples=6, deadline=None)
@given(_adv_rows)
def test_metadata_aggregates_exact_or_refused_adversarial(
    spark, tmp_path_factory, rows
):
    from f1_bigdata_pyspark_spark.sources.snapshots import SnapshotTable

    data = [(i, s, x) for i, (s, x) in enumerate(rows)]
    t = SnapshotTable(str(tmp_path_factory.mktemp("advm") / "tbl"))
    t.commit(
        spark.createDataFrame(
            data, "rid long, s string, x double"
        ).repartition(1),
        mode="append",
    )
    # count under a float range: Spark truth vs metadata tri-state
    for where in (
        [("x", "<=", 0.0)],
        [("x", ">", 0.0)],
        [("s", ">=", "q")],
        None,
    ):
        truth = sum(
            1
            for _, s, x in data
            if all(
                _spark_sat(s if c == "s" else x, op, lit)
                for c, op, lit in (where or [])
            )
        )
        mc = t.metadata_count(where=where)
        assert mc is None or mc == truth, (where, mc, truth)
    # min/max per column: exact over non-null rows or refused; under
    # NaN the exact Spark max is NaN itself — must refuse
    for cname, idx in (("s", 1), ("x", 2)):
        vals = [r[idx] for r in data if r[idx] is not None]
        mm = t.metadata_min_max(cname)
        if mm is not None and mm != (None, None):
            assert vals and not any(
                isinstance(v, float) and math.isnan(v) for v in vals
            )
            assert mm == (min(vals), max(vals))
        elif mm == (None, None):
            assert not vals


# -------------------------------------------- manifest delta encoding
# (round 9): encode(full, base) either DECLINES or resolves back to a
# manifest indistinguishable from the full form — for arbitrary
# carried/added/removed file sets, per-file map mutations, and small-key
# changes. Pure-python roundtrip through the real on-disk loader.

_mf_files = st.lists(
    st.sampled_from([f"f{i}" for i in range(8)]),
    unique=True,
    max_size=8,
)


@settings(max_examples=40, deadline=None)
@given(
    _mf_files,
    _mf_files,
    st.dictionaries(
        st.sampled_from([f"f{i}" for i in range(8)]),
        st.integers(min_value=0, max_value=3),
        max_size=8,
    ),
    st.booleans(),
)
def test_manifest_delta_roundtrips_or_declines(
    tmp_path_factory, base_files, new_extra, seq_seed, change_schema
):
    import json
    import os

    from f1_bigdata_pyspark_spark.sources.snapshots import (
        _encode_manifest_delta,
        load_manifest,
    )

    # construct: carried = base order minus removals, adds at the end
    carried = [f for f in base_files if hash(f) % 3 != 0]
    adds = [f for f in new_extra if f not in base_files]
    new_files = carried + adds
    base = {
        "version": 4,
        "files": list(base_files),
        "stats": {f: {"k": {"min": ["num", i]}} for i, f in enumerate(base_files)},
        "file_seq": {f: 1 for f in base_files},
        "schema": "S0",
        "mode": "append",
    }
    full = {
        "version": 5,
        "files": new_files,
        # carried stats mutate for seq_seed-selected files (e.g. a
        # recomputed entry) — the encoder must carry the NEW value
        "stats": {
            f: {"k": {"min": ["num", seq_seed.get(f, 0) + 100]}}
            if f in seq_seed
            else base["stats"].get(f, {"k": {"min": ["num", -1]}})
            for f in new_files
        },
        "file_seq": {f: (5 if f in adds else 1) for f in new_files},
        "schema": "S1" if change_schema else "S0",
        "mode": "append",
        "committed_at": 123.0,
    }
    d = _encode_manifest_delta(full, base)
    if d is None:
        return  # declining is always sound (caller writes a checkpoint)
    root = str(tmp_path_factory.mktemp("mf"))
    os.makedirs(os.path.join(root, "_manifests"))
    with open(os.path.join(root, "_manifests", "v4.json"), "w") as fh:
        json.dump(base, fh)
    with open(os.path.join(root, "_manifests", "v5.json"), "w") as fh:
        json.dump(d, fh)
    got = load_manifest(root, 5)
    assert got["files"] == full["files"]
    assert got["stats"] == full["stats"]
    assert got["file_seq"] == full["file_seq"]
    assert got["schema"] == full["schema"]
    assert got["version"] == 5 and got["mode"] == "append"
    assert got["committed_at"] == 123.0


# ------------------------------------------------ positional deletion
# vectors (round 9): random interleavings of appends, merge-on-read
# deletes/updates, copy-on-write deletes and DV-aware compaction must
# equal a plain Python shadow model — the row-address machinery (file
# path + row ordinal, bucket routing, carry filters, through-the-scan
# rewrites) can never change an answer.

_dvp_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 4)),
        st.tuples(st.just("del_mor"), st.integers(0, 5)),
        st.tuples(st.just("upd_mor"), st.integers(0, 5)),
        st.tuples(st.just("del_cow"), st.integers(0, 5)),
        st.tuples(st.just("purge"), st.just(0)),
    ),
    min_size=1,
    max_size=5,
)


@settings(max_examples=6, deadline=None)
@given(_dvp_ops)
def test_dv_ops_match_shadow_model(spark, tmp_path_factory, ops):
    from f1_bigdata_pyspark_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path_factory.mktemp("dvp") / "tbl"))
    rows = [(i, i % 4, i * 10) for i in range(12)]
    t.commit(
        spark.createDataFrame(rows, "rid long, g long, v long")
        .repartition(2),
        mode="append",
    )
    shadow = list(rows)
    next_rid = 100
    for kind, seed in ops:
        if kind == "append":
            block = [(next_rid + j, seed, (next_rid + j) * 10) for j in range(3)]
            next_rid += 10
            t.commit(
                spark.createDataFrame(block, "rid long, g long, v long")
                .repartition(1),
                mode="append",
            )
            shadow.extend(block)
        elif kind == "del_mor":
            t.delete_where_mor(spark, [("g", "=", seed % 4)])
            shadow = [r for r in shadow if r[1] != seed % 4]
        elif kind == "upd_mor":
            t.update_where_mor(
                spark, {"v": "v + 1000"}, [("rid", "<", seed * 20)]
            )
            shadow = [
                (rid, g, v + 1000 if rid < seed * 20 else v)
                for rid, g, v in shadow
            ]
        elif kind == "del_cow":
            t.delete_where(spark, [("v", ">=", seed * 300)])
            shadow = [r for r in shadow if r[2] < seed * 300]
        else:  # purge
            t.optimize_deletions(spark, min_masked_fraction=0.3)
        got = sorted(
            (r.rid, r.g, r.v) for r in t.read(spark).collect()
        )
        assert got == sorted(shadow), (kind, seed, ops)
