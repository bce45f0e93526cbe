"""Similarity search over embedding columns (LLM-pipeline scope).

Brute-force cosine top-k is the exact baseline: one narrow map computing the
score against a broadcast query vector + TakeOrdered — no shuffle of vector
data, linear scan, trivially parallel at 100 TB.

The scale path bounds the scanned set instead:
- ``lsh_buckets``: random-hyperplane LSH — sign bits of dot(v, h_i) for
  deterministic pseudo-random hyperplanes from a closed-form sin sequence
  (component j of plane p is sin(1000003·p + j), chosen so the oracle can
  regenerate the exact planes in SQL), giving a b-bit bucket id; search
  only the query's bucket (and neighbors at higher recall). Bucketing is
  again one narrow map.
- ``ivf_assign``: IVF-style coarse quantization — assign each vector to the
  nearest of k fixed centroids (first-k-by-id here; k-means on a sample in a
  real pipeline), search only the query's cell.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.functions.vectors import cosine, dot


def brute_force_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector.
    Deterministic tie-break on id. Columns: vec_id, cos_sim."""
    q = F.lit(query_vec).cast("array<double>")
    scored = vectors.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), round_to).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def similarity_threshold(
    vectors: DataFrame,
    query_vec: list[float],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """All vectors with cosine >= threshold (set-stable alternative to top-k
    for oracle comparison). Columns: vec_id, cos_sim."""
    q = F.lit(query_vec).cast("array<double>")
    sim = cosine(F.col(vec_col), q)
    return vectors.select(
        F.col(id_col), F.round(sim, round_to).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)


_PLANE_STRIDE = 1_000_003  # prime stride decorrelates planes


def _hyperplane(dim: int, plane_idx: int) -> Column:
    """Deterministic pseudo-random hyperplane: component j is
    ``sin(stride·plane + j)`` — a closed-form quasi-random sequence in
    [-1, 1] that ANY engine can recompute (DuckDB included), so LSH bucket
    ids are oracle-checkable instead of engine-hash-private. Reproducible
    across runs without storing planes."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.sin(F.lit(float(_PLANE_STRIDE * plane_idx)) + j.cast("double")),
    )


def lsh_buckets(
    vectors: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH bucket id (0 .. 2^n_planes-1) per vector.
    Columns: vec_id, bucket. Pass ``dim`` when known to skip the one-row
    dimension probe job."""
    if dim is None:
        dim_df = vectors.select(F.size(vec_col).alias("d")).limit(1).collect()
        dim = dim_df[0]["d"]
    bits = [
        F.when(dot(F.col(vec_col), _hyperplane(dim, p)) >= 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
        for p in range(n_planes)
    ]
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return vectors.select(F.col(id_col), bucket.cast("int").alias("bucket"))


def lsh_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 20,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: score only vectors in the query's LSH bucket. Recall < 1 by
    construction; at scale this is the candidate generator and
    ``brute_force_topk`` over candidates is the re-ranker."""
    dim = len(query_vec)
    buckets = lsh_buckets(vectors, n_planes, id_col, vec_col, dim=dim)
    q = F.lit(query_vec).cast("array<double>")
    candidates = vectors.join(buckets, id_col)
    # compute query bucket via a 1-row DataFrame through the same expressions
    one = vectors.sparkSession.range(1).select(q.alias("qv"))
    qbucket_bits = [
        F.when(dot(F.col("qv"), _hyperplane(dim, p)) >= 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
        for p in range(n_planes)
    ]
    qb = qbucket_bits[0]
    for b in qbucket_bits[1:]:
        qb = qb + b
    qbucket = one.select(qb.cast("int").alias("b")).collect()[0]["b"]
    return (
        candidates.filter(F.col("bucket") == qbucket)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def kmeans_step(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """One Lloyd iteration: assign every vector to its nearest centroid
    (rounded-cosine argmax, id tiebreak — deterministic), then recompute
    each centroid as the element-wise mean of its members. Returns the new
    centroid table (centroid_id, centroid: array<double>); cells that lose
    all members disappear, as in textbook Lloyd.

    Fully relational: posexplode → (centroid, dim) mean → rebuild array via
    ordered collect. Per iteration: one broadcast cross-join (k centroids is
    small) + one narrow explode + two keyed aggregations — no driver-side
    vector math, so a 100 TB corpus trains coarse IVF centroids with
    map-side-combined partial sums. Iterate from a small deterministic seed
    (e.g. first-k-by-id) or a sample."""
    assigned = ivf_assign(
        vectors, centroids, id_col, vec_col, round_to=round_to
    ).select(id_col, "centroid_id")
    members = assigned.join(
        vectors.select(id_col, F.col(vec_col).cast("array<double>").alias("v")),
        id_col,
    )
    dims = members.select(
        "centroid_id", F.posexplode(F.col("v")).alias("pos", "val")
    )
    means = dims.groupBy("centroid_id", "pos").agg(F.avg("val").alias("m"))
    return means.groupBy("centroid_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("centroid")
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
    round_to: int = 6,
) -> DataFrame:
    """IVF coarse assignment: nearest centroid by cosine via broadcast
    cross-join + keep-best (k centroids is small by construction).
    Columns: vec_id, centroid_id, cos_sim.

    Scores are rounded BEFORE the argmax so near-ties resolve by the
    centroid-id tiebreak identically in any double-precision engine —
    the assignment is oracle-checkable, not a float-noise lottery."""
    from pyspark.sql import Window

    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(centroid_id_col),
        F.round(
            cosine(F.col(vec_col), F.col(centroid_vec_col)), round_to
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cos_sim").desc(), F.col(centroid_id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def lsh_multiprobe_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 20,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH ANN top-k: score the query's bucket AND every bucket
    at Hamming distance 1 (one sign bit flipped). The near-miss failure of
    single-bucket LSH is a vector sitting just across ONE hyperplane from
    the query; probing the n_planes single-flip neighbors recovers exactly
    those, multiplying recall for ~(n_planes+1)/2^n_planes of the scan a
    full sweep would cost — without building more hash tables (the
    Lv et al. multi-probe trade). Same probe trick a production IVF search
    applies as nprobe > 1."""
    dim = len(query_vec)
    buckets = lsh_buckets(vectors, n_planes, id_col, vec_col, dim=dim)
    q = F.lit(query_vec).cast("array<double>")
    one = vectors.sparkSession.range(1).select(q.alias("qv"))
    qbucket_bits = [
        F.when(dot(F.col("qv"), _hyperplane(dim, p)) >= 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
        for p in range(n_planes)
    ]
    qb = qbucket_bits[0]
    for b in qbucket_bits[1:]:
        qb = qb + b
    qbucket = one.select(qb.cast("int").alias("b")).collect()[0]["b"]
    probes = [qbucket] + [qbucket ^ (1 << p) for p in range(n_planes)]
    return (
        vectors.join(buckets, id_col)
        .filter(F.col("bucket").isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_probe_topk(
    vectors: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 20,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF search with nprobe > 1: scan the cells of the query's ``nprobe``
    nearest centroids instead of only the nearest — THE recall/cost knob of
    inverted-file ANN (a vector near a cell boundary lives in a different
    cell than the query; the second-nearest cell recovers it, the IVF
    counterpart of LSH multi-probe). Cost is the probed cells' sizes; the
    centroid table is broadcast-small by construction, so probing adds no
    shuffle — only a wider left-semi candidate set.

    ``assigned`` — the cell assignment is INDEX STATE, built once at
    ingest, not per query: pass a precomputed/persisted ``ivf_assign``
    output (or the persisted index table — see ``ivf_indexed_topk``) so a
    query touches only the probed cells. Left to None, the assignment is
    recomputed per call — a full corpus×centroids pass that costs MORE
    than a brute-force scan, acceptable only for one-shot use."""
    if assigned is None:
        assigned = ivf_assign(vectors, centroids, id_col, vec_col)
    q = F.lit(query_vec).cast("array<double>")
    qcells = (
        centroids.select(
            "centroid_id",
            F.round(cosine(F.col("centroid"), q), 6).alias("qc"),
        )
        .orderBy(F.col("qc").desc(), F.col("centroid_id").asc())
        .limit(nprobe)
        .select("centroid_id")
    )
    candidates = assigned.join(
        F.broadcast(qcells), "centroid_id", "left_semi"
    ).select(id_col)
    return (
        vectors.join(candidates, id_col, "left_semi")
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )
