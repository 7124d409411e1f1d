"""Sparse-vector algebra over long-form (id_col, token, weight) tables.

The reference's DVEC dictionary algebra (src/dvec.jl) re-expressed as
joins/aggregations — dot products, norms, normalization, addition, and
the cosine/angle distances (src/dvec.jl:319-379).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def norms(vecs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """(id, norm) — L2 norm per vector (src/dvec.jl:54-61)."""
    return vecs.groupBy(id_col).agg(F.sqrt(F.sum(F.col("weight") ** 2)).alias("norm"))


def l2_normalize(vecs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    w = Window.partitionBy(id_col)
    nrm = F.sqrt(F.sum(F.col("weight") ** 2).over(w))
    return vecs.withColumn("weight", F.col("weight") / nrm)


def add(a: DataFrame, b: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Elementwise sum of same-id vectors (src/dvec.jl:169-207)."""
    return (
        a.unionByName(b)
        .groupBy(id_col, "token")
        .agg(F.sum("weight").alias("weight"))
    )


def centroid(vecs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """L2-normalized sum of a set of sparse vectors -> one-vector table
    (token, weight) (reference: centroid, src/dvec.jl:200-217)."""
    summed = vecs.groupBy("token").agg(F.sum("weight").alias("weight"))
    total = F.sqrt(F.sum(F.col("weight") ** 2).over(Window.partitionBy()))
    return summed.withColumn("weight", F.col("weight") / total)


def pairwise_dot(a: DataFrame, b: DataFrame, *, a_id: str = "a_id", b_id: str = "b_id") -> DataFrame:
    """All-pairs sparse dot products via the shared-token join
    (src/dvec.jl:124-136): a (a_id, token, weight) x b (b_id, token,
    weight) -> (a_id, b_id, dot). Only pairs sharing a token appear."""
    aa = a.select(F.col(a_id), F.col("token"), F.col("weight").alias("__wa"))
    bb = b.select(F.col(b_id), F.col("token"), F.col("weight").alias("__wb"))
    return (
        aa.join(bb, "token")
        .groupBy(a_id, b_id)
        .agg(F.sum(F.col("__wa") * F.col("__wb")).alias("dot"))
    )


def cosine_distance(a: DataFrame, b: DataFrame, *, a_id: str = "a_id", b_id: str = "b_id") -> DataFrame:
    """1 - cos for all sharing pairs (CosineDistance over normalized
    vectors, src/dvec.jl:341-350)."""
    d = pairwise_dot(a, b, a_id=a_id, b_id=b_id)
    na = norms(a, id_col=a_id).withColumnRenamed("norm", "__na")
    nb = norms(b, id_col=b_id).withColumnRenamed("norm", "__nb")
    return (
        d.join(na, a_id).join(nb, b_id)
        .select(a_id, b_id, (1.0 - F.col("dot") / (F.col("__na") * F.col("__nb"))).alias("dist"))
    )


def angle_distance(a: DataFrame, b: DataFrame, *, a_id: str = "a_id", b_id: str = "b_id") -> DataFrame:
    """acos of the clamped cosine (AngleDistance, src/dvec.jl:360-379)."""
    d = pairwise_dot(a, b, a_id=a_id, b_id=b_id)
    na = norms(a, id_col=a_id).withColumnRenamed("norm", "__na")
    nb = norms(b, id_col=b_id).withColumnRenamed("norm", "__nb")
    cos = F.col("dot") / (F.col("__na") * F.col("__nb"))
    clamped = F.least(F.greatest(cos, F.lit(-1.0)), F.lit(1.0))
    return (
        d.join(na, a_id).join(nb, b_id)
        .select(a_id, b_id, F.acos(clamped).alias("dist"))
    )
