"""Similarity search over embedding columns (array<float>).

Two paths, as a large-scale pipeline needs:

- ``cosine_topk``: exact brute-force top-k. The query matrix is small
  and broadcast; each executor partition scores its slice with one
  numpy matmul inside mapInPandas (Arrow batches, no per-row Python).
- ``lsh_cosine_topk``: random-hyperplane LSH. Hyperplane components are
  md5-derived pseudo-randoms, so buckets are deterministic across
  engines and cluster sizes (the DuckDB oracle reproduces them
  bit-for-bit). Candidates sharing the query's bucket are re-scored
  exactly; this is the scale path — the join is on the bucket key, and
  only bucket-mates are scored.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hyperplane_expr(n_planes: int, dim: int):
    """plane[p][d] = (md5 nibble-derived uniform in [-0.5, 0.5)).
    Returns a python list of lists — also reproducible in SQL as
    (hex->int of md5 prefix)/2^32 - 0.5."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:8]
            row.append(int(h, 16) / 2**32 - 0.5)
        planes.append(row)
    return planes


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors (self excluded) for the given query
    ids: (query_id, rank, neighbor_id, cos)."""
    qrows = embeddings.filter(F.col(id_col).isin(query_ids)).select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    out_schema = "query_id long, neighbor_id long, cos double"

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (mat / norms) @ q_norm.T  # (batch, n_queries)
            nq = len(q_ids)
            yield pd.DataFrame({
                "query_id": np.repeat(q_ids, len(ids)),
                "neighbor_id": np.tile(ids, nq),
                "cos": sims.T.reshape(-1),
            })

    scored = embeddings.select(id_col, vec_col).mapInPandas(score, out_schema)
    scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def with_lsh_bucket(embeddings: DataFrame, n_planes: int = 8, dim: int = 64, *,
                    vec_col: str = "embedding") -> DataFrame:
    """Adds a deterministic sign-LSH ``bucket`` string column."""
    planes = _hyperplane_expr(n_planes, dim)
    bits = []
    for p in range(n_planes):
        dot = sum(
            (F.col(vec_col)[d].cast("double") * F.lit(planes[p][d]) for d in range(dim)),
            F.lit(0.0),
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return embeddings.withColumn("bucket", F.concat(*bits))


def lsh_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    *,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates share a sign-LSH
    bucket, then exact cosine >= threshold. (vec_a, vec_b, cos) with
    vec_a < vec_b. The join key is the bucket string, so at scale each
    bucket's pair enumeration stays local to its shuffle partition; the
    plane count bounds expected bucket size (n / 2^planes)."""
    b = with_lsh_bucket(embeddings, n_planes, dim, vec_col=vec_col)
    a = b.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("__va"), "bucket")
    c = b.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("__vb"), "bucket")
    pairs = a.join(c, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    # left-fold in dimension order: bit-compatible with a sequential
    # dot-product loop (the DuckDB oracle's list_dot_product)
    dot = sum((F.col("__va")[d].cast("double") * F.col("__vb")[d].cast("double")
               for d in range(dim)), F.lit(0.0))
    nrm = lambda c_: F.sqrt(sum((F.col(c_)[d].cast("double") ** 2 for d in range(dim)),
                                F.lit(0.0)))
    return (
        pairs.select("vec_a", "vec_b", (dot / (nrm("__va") * nrm("__vb"))).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def lsh_cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    *,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine among same-bucket candidates.
    (query_id, rank, neighbor_id, cos)."""
    b = with_lsh_bucket(embeddings, n_planes, dim, vec_col=vec_col).cache()
    q = b.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "bucket"
    )
    cand = b.join(F.broadcast(q), "bucket").filter(F.col(id_col) != F.col("query_id"))
    dot = sum(
        (F.col(vec_col)[d].cast("double") * F.col("qvec")[d].cast("double") for d in range(dim)),
        F.lit(0.0),
    )
    norm = lambda c: F.sqrt(sum((F.col(c)[d].cast("double") ** 2 for d in range(dim)), F.lit(0.0)))
    scored = cand.select(
        "query_id", F.col(id_col).alias("neighbor_id"),
        (dot / (norm(vec_col) * norm("qvec"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )
