"""Embedding similarity search over `embeddings(vec_id, embedding, label)`.

* brute-force cosine top-k — the exactness baseline: broadcast the
  (small) query set against the full table; per-row cosine stays
  JVM-side via zip_with/aggregate (sequential fold => deterministic
  summation order); ranking by (similarity desc, vec_id asc) is a
  total order.
* random-hyperplane LSH bucketing — the scale path: a b-bit signature
  from sign(v . h_j) with pseudo-random +-1 hyperplanes derived from
  md5 hex characters (engine-portable, no RNG state); neighbor search
  then only joins within buckets. The signature matmul runs as a
  vectorized numpy pandas UDF (Arrow batches), the bucket join is a
  plain shuffle join on the signature.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cosine(a: F.Column, b: F.Column) -> F.Column:
    """Cosine similarity of two array<float> columns, computed in double.

    zip_with + aggregate folds left-to-right — deterministic and
    reproducible across runs/engines.
    """
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (norm(a) * norm(b))


def knn_bruteforce(
    vectors: DataFrame, queries: DataFrame, k: int = 3
) -> DataFrame:
    """(query_id, rank, neighbor_id): exact top-k cosine neighbors.

    ``queries``: (query_id, query_vec). The query side is broadcast, so
    the "cross join" is a map-side nested loop over each partition —
    no shuffle until the per-query top-k window.
    """
    joined = vectors.join(F.broadcast(queries), vectors["vec_id"] != queries["query_id"])
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("query_vec"), F.col("embedding")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def hyperplane_signs(n_bits: int, dim: int) -> list[list[float]]:
    """Deterministic +-1 hyperplanes: component d of plane j is +1 iff
    hex char (d mod 32) of md5('j:d') has its top nibble bit set —
    byte-identical to the oracle's SQL derivation."""
    import hashlib

    planes = []
    for j in range(n_bits):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{j}:{d}".encode()).hexdigest()
            row.append(1.0 if h[0] in "89abcdef" else -1.0)
        planes.append(row)
    return planes


def lsh_bucket_signatures(
    vectors: DataFrame, n_bits: int = 8, dim: int = 64
) -> DataFrame:
    """(vec_id, bucket): random-hyperplane LSH signature as a bit-string.

    numpy matmul inside an Arrow-batched pandas UDF — one pass, no
    shuffle; the hyperplane matrix is a closure broadcast.
    """
    import numpy as np

    planes = np.array(hyperplane_signs(n_bits, dim))  # (b, dim)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            if len(mat) == 0:
                yield pd.DataFrame({"vec_id": [], "bucket": []})
                continue
            bits = (mat @ planes.T) >= 0.0  # (n, b)
            buckets = ["".join("1" if b else "0" for b in row) for row in bits]
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "bucket": buckets})

    return vectors.select("vec_id", "embedding").mapInPandas(
        run, schema="vec_id bigint, bucket string"
    )


def lsh_knn(
    vectors: DataFrame, queries: DataFrame, k: int = 3, n_bits: int = 8, dim: int = 64
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the query's
    LSH bucket (candidates sharing all n_bits)."""
    sig = lsh_bucket_signatures(vectors, n_bits, dim)
    vec_b = vectors.join(sig, "vec_id")
    qsig = (
        queries.withColumnRenamed("query_vec", "embedding")
        .withColumnRenamed("query_id", "vec_id")
    )
    q_b = (
        lsh_bucket_signatures(qsig, n_bits, dim)
        .withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("bucket", "qbucket")
        .join(queries, "query_id")
    )
    joined = vec_b.join(
        F.broadcast(q_b),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("query_vec"), F.col("embedding")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def _banded(sig: DataFrame, id_col: str, n_bits: int, band_bits: int) -> DataFrame:
    """Explode a bit-string signature into (id, band_idx, band_value)."""
    n_bands = n_bits // band_bits
    bands = F.explode(F.array(*[F.lit(b) for b in range(n_bands)])).alias("band")
    out = sig.select(id_col, "bucket", bands)
    return out.select(
        id_col,
        "band",
        F.substring(F.col("bucket"), F.col("band") * band_bits + 1, band_bits).alias("bv"),
    )


def lsh_knn_banded(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_bits: int = 16,
    band_bits: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k with banded (multi-probe) LSH: a candidate must
    share at least ONE band of the hyperplane signature instead of all
    n_bits — the standard recall fix for single-table hyperplane LSH
    (round-1 oracle showed all-bits matching returns 7/15 of the exact
    neighbors). Candidate volume per band is ~n/2^band_bits; the union
    over n_bits/band_bits bands is still far from O(n^2) and every join
    is a plain equi-join on (band, band_value)."""
    sig = lsh_bucket_signatures(vectors, n_bits, dim)
    vb = _banded(sig, "vec_id", n_bits, band_bits)
    qsig = (
        queries.withColumnRenamed("query_vec", "embedding")
        .withColumnRenamed("query_id", "vec_id")
    )
    qb = _banded(
        lsh_bucket_signatures(qsig, n_bits, dim), "vec_id", n_bits, band_bits
    ).withColumnRenamed("vec_id", "query_id")
    cand = (
        vb.join(F.broadcast(qb), ["band", "bv"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    scored = (
        cand.join(vectors, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("query_vec"), F.col("embedding")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
