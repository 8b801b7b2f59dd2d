"""Embedding similarity search: brute-force cosine top-k (exact
baseline) and random-hyperplane-LSH bucketed ANN (the scale path).

Design for 100 TB / 10^9+ vectors:

- the exact path broadcasts the (tiny) query side and evaluates the
  dot product with built-in higher-order functions (zip_with +
  aggregate) — JVM codegen, no Python, no shuffle beyond the final
  top-k (which AQE collapses to a single small exchange because the
  candidate set is already filtered);
- the ANN path computes b sign-bits per vector against deterministic
  seeded hyperplanes in ONE Arrow-batched numpy matmul per batch,
  buckets on the signature int, and only scores candidates sharing a
  bucket (multi-probe = hamming-1 neighbors of the query signature).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot_col(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential order (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def topk_bruteforce(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k vs the row with ``query_vec_id``.

    Similarity rounded to 4 decimals and ranked by (rounded sim desc,
    id asc) — a total order that is reproducible across engines and
    parallelism levels (floating-point sums agree to ~1e-12; the
    rounding absorbs that).
    """
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qvec")
    )
    sims = (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(cosine_col(F.col(vec_col), F.col("_qvec")), 4).alias("sim"),
        )
    )
    # top-k with deterministic tie-break; k is small → single ordered limit
    return sims.orderBy(F.col("sim").desc(), F.col(id_col).asc()).limit(k)


# ------------------------------------------------------------------ LSH ANN
def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes)).astype(np.float64)


def with_lsh_signature(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    sig_col: str = "bucket",
) -> DataFrame:
    """Append the random-hyperplane signature (int bucket id).

    One numpy (batch × dim) @ (dim × planes) matmul per Arrow batch.
    """
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(T.LongType())
    def sig(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (m @ planes) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(bits @ weights)

    return embeddings.withColumn(sig_col, sig(F.col(vec_col)))


def topk_lsh(
    embeddings: DataFrame,
    query_vec_id: int,
    dim: int,
    k: int = 10,
    n_planes: int = 16,
    seed: int = 42,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors whose signature matches the
    query's bucket (or differs in one bit with multiprobe).  Recall is
    approximate by construction — oracle checks are rows-only."""
    signed = with_lsh_signature(embeddings, dim, n_planes, seed, vec_col)
    qrow = signed.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qvec"), F.col("bucket").alias("_qb")
    )
    if multiprobe:
        probes = F.array(
            F.col("_qb"),
            *[F.col("_qb").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
        )
        qprobes = qrow.select("_qvec", F.explode(probes).alias("bucket"))
    else:
        qprobes = qrow.select("_qvec", F.col("_qb").alias("bucket"))
    cands = signed.filter(F.col(id_col) != query_vec_id).join(
        F.broadcast(qprobes), "bucket"
    )
    sims = cands.select(
        F.col(id_col),
        F.round(cosine_col(F.col(vec_col), F.col("_qvec")), 4).alias("sim"),
    ).dropDuplicates([id_col])
    return sims.orderBy(F.col("sim").desc(), F.col(id_col).asc()).limit(k)


def pairwise_topk_bruteforce(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block: DataFrame | None = None,
) -> DataFrame:
    """All-pairs exact top-k neighbors (small/medium corpora or within
    IVF cells): self-join + per-id window rank.  At 10^9 vectors this
    is the per-cell kernel after IVF partitioning, never the global
    plan."""
    from pyspark.sql import Window

    other = (block if block is not None else embeddings).select(
        F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("_nvec")
    )
    sims = (
        embeddings.crossJoin(other)
        .filter(F.col(id_col) != F.col("nbr_id"))
        .select(
            F.col(id_col),
            F.col("nbr_id"),
            F.round(cosine_col(F.col(vec_col), F.col("_nvec")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("nbr_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "nbr_id", "sim", "rank")
    )
