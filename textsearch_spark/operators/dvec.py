"""Sparse-vector algebra over long-form (id_col, token, weight) tables.

The reference's DVEC dictionary algebra (src/dvec.jl) re-expressed as
joins/aggregations — dot products, norms, normalization, addition, and
the cosine/angle distances (src/dvec.jl:319-379).
"""

from __future__ import annotations

from typing import Optional

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


def centroid(vecs: DataFrame) -> DataFrame:
    """L2-normalized sum of a set of sparse vectors -> one-vector table
    (token, weight) (reference: centroid, src/dvec.jl:200-217). One
    global centroid over all rows — per-group centroids are a groupBy
    away for callers that need them. (A previous signature took a dead
    ``id_col`` parameter that silently did nothing.)"""
    summed = sum_vectors(vecs)
    total = F.sqrt(F.sum(F.col("weight") ** 2).over(Window.partitionBy()))
    return summed.withColumn("weight", F.col("weight") / total)


def l1norm(vecs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """(id, l1norm) — sum of absolute weights (src/dvec.jl:98-105; the
    reference's literal loop body is broken Julia — ``v[i]`` on a scalar
    — so we implement the intended L1 norm, identical to the raw sum for
    the nonnegative weights used throughout the reference)."""
    return vecs.groupBy(id_col).agg(F.sum(F.abs(F.col("weight"))).alias("l1norm"))


def l1_normalize(vecs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Divide each entry by the vector's L1 norm (src/dvec.jl:108-115)."""
    w = Window.partitionBy(id_col)
    nrm = F.sum(F.abs(F.col("weight"))).over(w)
    return vecs.withColumn("weight", F.col("weight") / nrm)


def sub(a: DataFrame, b: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Elementwise a - b of same-id vectors (src/dvec.jl:246-259).

    Reference semantics: start from a copy of ``a``; every *nonzero*
    entry of ``b`` is subtracted (introducing the key with ``-w`` if
    absent). Keys whose difference is exactly 0 are kept, like the
    reference's dict entries."""
    aa = a.select(id_col, "token", F.col("weight").alias("__wa"))
    bb = b.filter(F.col("weight") != 0).select(
        id_col, "token", F.col("weight").alias("__wb")
    )
    return (
        aa.join(bb, [id_col, "token"], "full")
        .select(
            id_col, "token",
            (F.coalesce("__wa", F.lit(0.0)) - F.coalesce("__wb", F.lit(0.0))).alias("weight"),
        )
    )


def mul(a: DataFrame, b: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Elementwise (Hadamard) product of same-id vectors
    (src/dvec.jl:263-280): only keys present in both with a nonzero
    ``b`` weight survive — the inner join IS the reference's
    delete-on-missing loop."""
    aa = a.select(id_col, "token", F.col("weight").alias("__wa"))
    bb = b.filter(F.col("weight") != 0).select(
        id_col, "token", F.col("weight").alias("__wb")
    )
    return aa.join(bb, [id_col, "token"]).select(
        id_col, "token", (F.col("__wa") * F.col("__wb")).alias("weight")
    )


def scalar_mul(vecs: DataFrame, s: float) -> DataFrame:
    """vec * scalar (src/dvec.jl:283-297)."""
    return vecs.withColumn("weight", F.col("weight") * F.lit(float(s)))


def scalar_div(vecs: DataFrame, s: float) -> DataFrame:
    """vec / scalar == vec * (1/s) (src/dvec.jl:300-308)."""
    return scalar_mul(vecs, 1.0 / float(s))


def vec_extrema(vecs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Per-vector findmax/findmin/argmax/argmin/maximum/minimum
    (src/dvec.jl:17-47) in one aggregate:

        (id, max_weight, argmax_token, min_weight, argmin_token)

    The reference iterates dict order and keeps the last tied key —
    unspecified order; we pin ties deterministically (largest token for
    argmax, smallest for argmin via the struct ordering)."""
    return vecs.groupBy(id_col).agg(
        F.max(F.struct("weight", "token")).alias("__mx"),
        F.min(F.struct("weight", "token")).alias("__mn"),
    ).select(
        id_col,
        F.col("__mx.weight").alias("max_weight"),
        F.col("__mx.token").alias("argmax_token"),
        F.col("__mn.weight").alias("min_weight"),
        F.col("__mn.token").alias("argmin_token"),
    )


def nnz(vecs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """(id, nnz) — number of stored entries (src/dvec.jl:16)."""
    return vecs.groupBy(id_col).agg(F.count("*").alias("nnz"))


def sum_vectors(vecs: DataFrame) -> DataFrame:
    """Sum of all vectors in the table -> one-vector (token, weight)
    table (Base.sum over DVEC lists, src/dvec.jl:200-207)."""
    return vecs.groupBy("token").agg(F.sum("weight").alias("weight"))


def sparse_coo(vecs: DataFrame, *, id_col: str = "doc_id", minweight: float = 1e-9) -> DataFrame:
    """COO triplets from a long-form vector table with the reference's
    filters (sparse_coo, src/sparseconversions.jl:47-62): drop entries
    below ``minweight`` (and the OOV/sentinel key, the reference's
    ``term > 0``)."""
    from ..functions.weighting import EMPTY_SENTINEL

    return vecs.filter(
        (F.col("weight") >= minweight) & (F.col("token") != EMPTY_SENTINEL)
    ).select(id_col, "token", "weight")


def to_indexed(vecs: DataFrame, token_ids: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Long form -> per-vector CSC-style arrays
    ``(id, indices array<int>, values array<double>)``, index-sorted —
    the ``sparsevec(dvec)`` conversion (src/sparseconversions.jl:21-37)
    in Spark's native sparse layout. ``token_ids`` maps (token,
    token_id); unmapped tokens drop (the reference skips t <= 0).

    Feed the result to ``pyspark.ml`` via
    ``SparseVector(size, row.indices, row.values)`` per row, or keep it
    columnar — every operator in this module works on the long form."""
    # no broadcast hint: token_ids is VOCABULARY-sized (can exceed the
    # broadcast limit on a web corpus) — AQE still broadcasts small ones
    j = vecs.join(token_ids.select("token", "token_id"), "token")
    return (
        j.groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct(F.col("token_id"), F.col("weight")))).alias("__e"))
        .select(
            id_col,
            F.col("__e.token_id").alias("indices"),
            F.col("__e.weight").alias("values"),
        )
    )


def from_indexed(indexed: DataFrame, token_ids: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Inverse of :func:`to_indexed` — the ``dvec(sparsevector)``
    conversion (src/sparseconversions.jl:12-14)."""
    x = indexed.select(
        id_col, F.explode(F.arrays_zip("indices", "values")).alias("__p")
    ).select(
        id_col,
        F.col("__p.indices").alias("token_id"),
        F.col("__p.values").alias("weight"),
    )
    # vocabulary-sized mapping: let AQE pick the join strategy
    return x.join(token_ids.select("token", "token_id"), "token_id").select(
        id_col, "token", "weight"
    )


def _normalize_token_ids(token_ids: DataFrame, one_based: Optional[bool],
                         need_max: bool = True):
    """(ids shifted to 0-based, max 0-based id or None).

    ``one_based=None`` infers from min(token_id) >= 1 — right for the
    two producers in this package (``with_term_ids`` emits dense
    1-based ids that always include 1; 0-based ML maps always include
    0) but WRONG for a caller-made subset map that merely lacks its
    lowest id: pass ``one_based`` explicitly for those.

    The inference (and the max) cost one aggregate job over the
    vocabulary-sized map; ``one_based`` explicit + ``need_max=False``
    skips that job entirely (the max is then None regardless of the
    table, NOT an emptiness signal — callers on that path must not
    need one)."""
    ids = token_ids.select("token", F.col("token_id").cast("int").alias("token_id"))
    if one_based is not None and not need_max:
        if one_based:
            ids = ids.withColumn("token_id", F.col("token_id") - 1)
        return ids, None
    # min is only needed for the inference; max only when asked — but
    # both ride the same single aggregate job, so fold them together
    lo_hi = ids.agg(F.min("token_id"), F.max("token_id")).first()
    if lo_hi[0] is None:
        return ids, None
    shift = bool(lo_hi[0] >= 1) if one_based is None else bool(one_based)
    if shift:
        ids = ids.withColumn("token_id", F.col("token_id") - 1)
        return ids, int(lo_hi[1]) - 1
    return ids, int(lo_hi[1])


def to_ml_vectors(vecs: DataFrame, token_ids: DataFrame, *, id_col: str = "doc_id",
                  dim: Optional[int] = None, vector_col: str = "vector",
                  one_based: Optional[bool] = None) -> DataFrame:
    """Long form -> ``(id, vector)`` with an actual
    ``pyspark.ml.linalg.SparseVector`` column (SURVEY D6; the
    reference's ``sparsevec`` conversion, src/sparseconversions.jl:
    21-37) so Spark-ML consumers use the vectorize output directly.

    ``token_ids`` maps (token, token_id) with 0-based ML indices;
    1-based ids (``with_term_ids``'s ``term_id``) are shifted down
    automatically — the inference is min(token_id) >= 1, so a 0-based
    SUBSET map that happens to lack id 0 must pass ``one_based=False``
    explicitly (and symmetric for from_ml_vectors). The empty-doc sentinel
    (EMPTY_SENTINEL, src/vmodel.jl's ``{0 => 1f0}``) carries no
    in-vocabulary term, so an empty/all-OOV doc comes out as an
    all-zero SparseVector of the right dimension — still one row per
    input vector id.

    VectorUDT is not Arrow-representable, so the final constructor is a
    plain Python UDF over the two pre-assembled arrays — an API-EDGE
    converter by design (per-row work is two array handoffs; all the
    heavy lifting — join, group, sort — happened JVM-side upstream).
    """
    from pyspark.ml.linalg import SparseVector, VectorUDT

    # the max (one vocabulary-scan job) is only needed to derive dim
    ids, max_id = _normalize_token_ids(token_ids, one_based,
                                       need_max=dim is None)
    if dim is None:
        if max_id is None:
            raise ValueError(
                "to_ml_vectors: token_ids is empty and dim was not "
                "given — pass dim explicitly to build (all-zero) "
                "vectors of a known dimension")
        dim = max_id + 1
    from ..functions.weighting import EMPTY_SENTINEL

    idx = to_indexed(vecs.filter(F.col("token") != EMPTY_SENTINEL), ids, id_col=id_col)
    all_ids = vecs.select(id_col).distinct()
    filled = all_ids.join(idx, id_col, "left").select(
        id_col,
        F.coalesce("indices", F.array().cast("array<int>")).alias("indices"),
        F.coalesce("values", F.array().cast("array<double>")).alias("values"),
    )

    @F.udf(returnType=VectorUDT())
    def _mk(indices, values):
        return SparseVector(dim, indices, values)

    return filled.select(id_col, _mk("indices", "values").alias(vector_col))


def from_ml_vectors(df: DataFrame, token_ids: DataFrame, *, id_col: str = "doc_id",
                    vector_col: str = "vector",
                    one_based: Optional[bool] = None) -> DataFrame:
    """Inverse of :func:`to_ml_vectors`: ``(id, vector)`` -> long form
    ``(id, token, weight)`` (the reference's ``dvec(sparsevector)``,
    src/sparseconversions.jl:12-14 — zeros stay absent, so an all-zero
    vector yields no rows, like the reference's empty DVEC). Extracts
    (indices, values) sparsely — never densifies, so a 10^6-dim
    vocabulary costs only nnz per row."""
    from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                                   StructField, StructType)

    pair_t = ArrayType(StructType([
        StructField("token_id", IntegerType()), StructField("weight", DoubleType())]))

    @F.udf(returnType=pair_t)
    def _pairs(v):
        if v is None:
            return []
        if hasattr(v, "indices"):  # SparseVector
            return [(int(i), float(x)) for i, x in zip(v.indices, v.values)]
        return [(i, float(x)) for i, x in enumerate(v) if x != 0.0]  # DenseVector

    # no dim to derive here — skip the vocabulary aggregate whenever
    # the caller stated one_based explicitly
    ids, _ = _normalize_token_ids(token_ids, one_based, need_max=False)
    x = df.select(id_col, F.explode(_pairs(vector_col)).alias("__p")).select(
        id_col, F.col("__p.token_id").alias("token_id"), F.col("__p.weight").alias("weight"))
    # vocabulary-sized mapping: let AQE pick the join strategy
    return x.join(ids, "token_id").select(id_col, "token", "weight")


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
