#!/usr/bin/env python
"""A/B: bench-query wall time with vs without the trailing display orderBy."""
import sys, time

sys.path.insert(0, "/root/repo")
from f1_bigdata_pyspark_spark.session import env_sf_dir, get_spark
from f1_bigdata_pyspark_spark.queries.registry import _REGISTRY
from f1_bigdata_pyspark_spark.catalog import TABLES, load_table

sf_dir = env_sf_dir()
spark = get_spark(app_name="ab-orderby")
for t in TABLES:
    load_table(spark, sf_dir, t).count()

names = ["pricing_summary", "user_sessions", "revenue_by_nation", "minhash_lsh_candidates"]


def timeit(fn, n=5):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


for name in names:
    q = _REGISTRY[name]
    a = timeit(lambda: q.fn(spark, sf_dir).collect())
    # strip the trailing Sort via a no-op projection reorder: rebuild without orderBy
    # approximation: take the df and remove the final sort by re-planning with sortWithinPartitions?
    # Instead, time df without .orderBy by monkey approach: not generic. Use logical child if Sort.
    df = q.fn(spark, sf_dir)
    jdf = df._jdf
    # peel a top-level Sort from the logical plan if present
    lp = jdf.queryExecution().logical()
    cls = lp.getClass().getSimpleName()
    if cls == "Sort":
        child = lp.children().head()
        from pyspark.sql import DataFrame

        nodf = DataFrame(
            spark._jsparkSession.internalCreateDataFrame(
                jdf.queryExecution().toRdd(), jdf.schema(), False
            ),
            spark,
        ) if False else None
        # simpler: Dataset.ofRows
        ds = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, child
        )
        b = timeit(lambda: ds.collectAsList())
    else:
        b = float("nan")
    print(f"{name}: with_sort={a:.3f} without_sort={b:.3f} (top={cls})", flush=True)
spark.stop()
