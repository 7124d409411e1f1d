"""Similarity search over embedding columns (array<float>).

Two paths, as a large-scale pipeline needs:

- ``cosine_topk``: exact brute-force top-k. The query matrix is small
  and broadcast; each executor partition scores its slice with one
  numpy matmul inside mapInPandas (Arrow batches, no per-row Python)
  and keeps a **bounded per-batch top-k**, so the kernel emits at most
  k rows per (query, batch) — never the n_docs x n_queries score
  matrix. The final window merges bounded candidates only.
- ``lsh_cosine_topk``: random-hyperplane LSH. Hyperplane components are
  md5-derived pseudo-randoms, so buckets are deterministic across
  engines and cluster sizes (the DuckDB oracle reproduces them
  bit-for-bit). Candidates sharing the query's bucket are re-scored
  exactly; this is the scale path — the join is on the bucket key, and
  only bucket-mates are scored.

All dot products / norms / sign projections run as vectorized numpy
matmuls inside Arrow-batched pandas UDFs — one kernel regardless of
dimension, so real embedding widths (768-4096) cost a matmul, not a
4096-term Catalyst expression tree.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType
from pyspark.sql.window import Window

# guard on the driver-side collect of query vectors: queries are the
# broadcast side and must stay small (split larger query sets into
# batches — results are independent per query)
MAX_QUERY_BATCH = 65536


def _hyperplanes(n_planes: int, dim: int) -> np.ndarray:
    """plane[p][d] = md5 nibble-derived uniform in [-0.5, 0.5) —
    deterministic across engines; also reproducible in SQL as
    (hex->int of md5 prefix)/2^32 - 0.5."""
    import hashlib

    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for d in range(dim):
            h = hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:8]
            out[p, d] = int(h, 16) / 2**32 - 0.5
    return out


def _hyperplane_expr(n_planes: int, dim: int) -> list[list[float]]:
    """Plane table as plain Python floats — used by the DuckDB oracle
    generator to embed the identical constants in SQL."""
    return _hyperplanes(n_planes, dim).tolist()


def _to_matrix(series: pd.Series) -> np.ndarray:
    return np.array(series.tolist(), dtype=np.float64)


def _topk_rows(ids: np.ndarray, sims: np.ndarray, k: int):
    """Top-k of one query's batch scores by (cos desc, id asc).
    O(n) argpartition prefilter + exact sort of the surviving <=2k."""
    n = len(ids)
    if n > 2 * k:
        part = np.argpartition(-sims, k - 1)
        kth = sims[part[k - 1]]
        keep = np.flatnonzero(sims >= kth)
    else:
        keep = np.arange(n)
    order = np.lexsort((ids[keep], -sims[keep]))[:k]
    sel = keep[order]
    return ids[sel], sims[sel]


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors (self excluded) for the given query
    ids: (query_id, rank, neighbor_id, cos).

    Scale shape: the kernel emits <= k * n_queries rows per Arrow batch
    (bounded local top-k, same pattern as the WAND bucket kernel), so
    the merge window sees <= k * n_queries * n_partitions rows — never
    an n_docs x n_queries stage.
    """
    assert len(query_ids) <= MAX_QUERY_BATCH, (
        f"query batch {len(query_ids)} exceeds {MAX_QUERY_BATCH}; split the batch"
    )
    qrows = embeddings.filter(F.col(id_col).isin(query_ids)).select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    out_schema = "query_id long, neighbor_id long, cos double"

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = _to_matrix(pdf[vec_col])
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (mat / norms) @ q_norm.T  # (batch, n_queries)
            out_q, out_i, out_c = [], [], []
            for qi in range(len(q_ids)):
                s = sims[:, qi]
                mask = ids != q_ids[qi]  # self-match excluded pre-top-k
                t_ids, t_sims = _topk_rows(ids[mask], s[mask], k)
                out_q.append(np.full(len(t_ids), q_ids[qi], dtype=np.int64))
                out_i.append(t_ids)
                out_c.append(t_sims)
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q) if out_q else np.empty(0, np.int64),
                "neighbor_id": np.concatenate(out_i) if out_i else np.empty(0, np.int64),
                "cos": np.concatenate(out_c) if out_c else np.empty(0),
            })

    scored = embeddings.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def _bucket_udf(n_planes: int, dim: int):
    planes_t = _hyperplanes(n_planes, dim).T  # (dim, planes)

    @pandas_udf(StringType())
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = _to_matrix(vecs)  # (n, dim)
        signs = (mat @ planes_t) >= 0  # (n, planes)
        bits = signs.astype(np.uint8).astype("U1")  # True/False -> '1'/'0'
        return pd.Series(["".join(row) for row in bits])

    return bucket


def with_lsh_bucket(embeddings: DataFrame, n_planes: int = 8, dim: int = 64, *,
                    vec_col: str = "embedding") -> DataFrame:
    """Adds a deterministic sign-LSH ``bucket`` string column. One
    vectorized matmul per Arrow batch — dimension-independent plan."""
    return embeddings.withColumn("bucket", _bucket_udf(n_planes, dim)(F.col(vec_col)))


@pandas_udf(DoubleType())
def _cos_udf(va: pd.Series, vb: pd.Series) -> pd.Series:
    a = _to_matrix(va)
    b = _to_matrix(vb)
    dots = np.einsum("ij,ij->i", a, b)
    na = np.linalg.norm(a, axis=1)
    nb = np.linalg.norm(b, axis=1)
    den = na * nb
    den[den == 0] = 1.0
    return pd.Series(dots / den)


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
    return (
        pairs.select("vec_a", "vec_b", _cos_udf(F.col("__va"), F.col("__vb")).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 16,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantizer: adds a ``centroid_id`` column.

    Centroids are the ``n_centroids`` corpus vectors with the smallest
    md5(vec_id) — a deterministic pseudo-random sample, reproducible by
    the SQL oracle (no Lloyd iterations: at 100TB the quantizer is
    trained once offline anyway; any centroid set partitions the space,
    and determinism is what makes the structure verifiable). Assignment
    is argmin L2 distance == argmax (dot - |c|^2/2) over the broadcast
    centroid matrix, one numpy matmul per Arrow batch."""
    spark = embeddings.sparkSession
    seeds = (
        embeddings.select(id_col)
        .withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h", id_col)
        .limit(n_centroids)
    )
    crows = (
        embeddings.join(F.broadcast(seeds.select(id_col)), id_col)
        .select(id_col, vec_col)
        .collect()
    )
    crows.sort(key=lambda r: r[0])
    c_ids = np.array([r[0] for r in crows], dtype=np.int64)
    c_mat = np.array([list(r[1]) for r in crows], dtype=np.float64)
    c_sq = 0.5 * np.einsum("ij,ij->i", c_mat, c_mat)
    bc = spark.sparkContext.broadcast((c_ids, c_mat, c_sq))

    @pandas_udf("long")
    def assign(vecs: pd.Series) -> pd.Series:
        ids, mat, sq = bc.value
        x = _to_matrix(vecs)
        # argmin |x-c|^2 == argmax (x.c - |c|^2/2); ties -> smallest
        # centroid id (ids are sorted, argmax returns the first max)
        scores = x @ mat.T - sq
        return pd.Series(ids[np.argmax(scores, axis=1)])

    return embeddings.withColumn("centroid_id", assign(F.col(vec_col)))


def ivf_cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    *,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: each query scans only the ``nprobe``
    inverted lists whose centroids are nearest to it, then exact cosine
    + bounded top-k. (query_id, rank, neighbor_id, cos).

    Scale shape: the corpus is hash-partitioned by centroid_id (the
    inverted lists); queries are a broadcast side carrying their probe
    sets, so the join touches corpus rows in probed lists only —
    n*nprobe/n_centroids of the table per query instead of all of it."""
    assigned = ivf_assign(embeddings, n_centroids, id_col=id_col, vec_col=vec_col).cache()

    # query probe lists: nprobe nearest centroids by the same L2 rule
    qrows = assigned.filter(F.col(id_col).isin(query_ids)).select(
        id_col, vec_col).collect()
    seeds = (
        assigned.select(F.col("centroid_id").alias("cid")).distinct()
        .join(assigned.select(F.col(id_col).alias("cid"), vec_col), "cid")
        .collect()
    )
    seeds.sort(key=lambda r: r[0])
    c_ids = np.array([r[0] for r in seeds], dtype=np.int64)
    c_mat = np.array([list(r[1]) for r in seeds], dtype=np.float64)
    c_sq = 0.5 * np.einsum("ij,ij->i", c_mat, c_mat)

    probes = []
    for r in qrows:
        x = np.array(list(r[1]), dtype=np.float64)
        scores = c_mat @ x - c_sq
        order = np.lexsort((c_ids, -scores))[:nprobe]
        for cid in c_ids[order]:
            probes.append((int(r[0]), int(cid)))
    spark = embeddings.sparkSession
    qprobe = spark.createDataFrame(probes, "query_id long, centroid_id long")
    qvecs = spark.createDataFrame(
        [(int(r[0]), list(map(float, r[1]))) for r in qrows],
        f"query_id long, qvec array<double>",
    )

    cand = (
        assigned.join(F.broadcast(qprobe), "centroid_id")
        .join(F.broadcast(qvecs), "query_id")
        .filter(F.col(id_col) != F.col("query_id"))
    )
    scored = cand.select(
        "query_id", F.col(id_col).alias("neighbor_id"),
        _cos_udf(F.col(vec_col), F.col("qvec")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
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
    scored = cand.select(
        "query_id", F.col(id_col).alias("neighbor_id"),
        _cos_udf(F.col(vec_col), F.col("qvec")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )
