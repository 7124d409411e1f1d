"""salted_topk (the shared two-phase skew-bounded top-k) must be
row-identical to the plain single-window top-k it replaces, for ANY
input partitioning — the phase-1 local top-k is a superset of the
global answer only if both phases apply the identical total order
(score desc, doc_id asc). Randomized scores are drawn from a tiny set
so tied groups straddle the k boundary constantly, and the input is
re-partitioned several ways (phase 1 keys on spark_partition_id, so
the partitioning is exactly the degree of freedom the equivalence
claim quantifies over)."""

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from textsearch_spark.operators.search import salted_topk

K = 7


def _plain_topk(scored, id_col, score_col, k):
    w = Window.partitionBy(id_col).orderBy(F.desc(score_col), F.asc("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(id_col, "rank", "doc_id", score_col))


def test_salted_topk_matches_plain_window(spark):
    rnd = random.Random(99)
    rows = []
    for q in range(6):
        n = rnd.choice([0, 3, K, 40, 200])  # fewer-than-k and skewed sizes
        docs = rnd.sample(range(10_000), n)
        for d in docs:
            # 5 distinct score values over up to 200 docs: ties everywhere
            rows.append((q, d, float(rnd.randint(1, 5))))
    scored = spark.createDataFrame(
        rows, "query_id long, doc_id long, score double")

    expected = sorted(map(tuple, _plain_topk(scored, "query_id", "score", K)
                          .collect()))
    for parts in (1, 3, 16):
        got = sorted(map(tuple,
                         salted_topk(scored.repartition(parts),
                                     "query_id", "score", K).collect()))
        assert got == expected, f"diverged at {parts} input partitions"
