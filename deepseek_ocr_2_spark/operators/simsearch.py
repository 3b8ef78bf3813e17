"""Similarity search over the embeddings table (array<float> column).

* ``cosine_topk``      — brute-force exact top-k for one query vector,
  computed JVM-side with ``zip_with`` + ``aggregate`` higher-order
  functions (no Python in the hot loop), oracle-verified against DuckDB.
* ``knn_self_join``    — exact top-1 neighbor for a slice of vectors
  (broadcast the slice; the scan side streams).
* ``lsh_ann_topk``     — the scale path: random-hyperplane LSH buckets
  (deterministic fixed-seed hyperplanes broadcast to executors, dot
  products via a vectorized pandas UDF on numpy), candidates reranked
  exactly.  At 10^12 rows the brute-force scan is one full pass per
  query; LSH touches only matching buckets — multi-probe over Hamming-1
  neighbors keeps recall high.

Determinism: cosine is computed in float64 in one fixed order (array
index order) in both engines; results round to 6 decimals and tie-break
on vec_id, so top-k sets hash-match the oracle.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from .relational import load

TOPK = 10
QUERY_VEC_ID = 0
# 6 planes -> 64 buckets: at 500 test vectors each bucket holds ~8, and
# 1+6 multi-probe buckets yield a ~10% candidate slice.  At real scale
# raise this (bucket count should track corpus size / desired slice).
N_HYPERPLANES = 6
LSH_SEED = 7


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 vs the query vector (vec_id=0), JVM-side."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec")
    )
    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(
                _dot(F.col("embedding"), F.col("qvec"))
                / (_norm(F.col("embedding")) * _norm(F.col("qvec"))),
                6,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(TOPK)


def cosine_topk_oracle() -> str:
    # Cast to DOUBLE[] so DuckDB computes in float64 like the Spark side
    # (on FLOAT[] it returns float32, which rounds differently).
    return f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
    SELECT vec_id, label,
           ROUND(list_cosine_similarity(embedding::DOUBLE[], qvec), 6) AS cosine
    FROM embeddings, q
    WHERE vec_id != {QUERY_VEC_ID}
    ORDER BY cosine DESC, vec_id ASC
    LIMIT {TOPK}
    """


def knn_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest neighbor for vec_id < 20 (broadcast probe side)."""
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pvec")
    )
    scored = (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("pvec"))
                / (_norm(F.col("embedding")) * _norm(F.col("pvec"))),
                6,
            ).alias("cosine"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("probe_id", F.col("vec_id").alias("nn_id"), "cosine")
        .orderBy("probe_id")
    )


def knn_self_join_oracle() -> str:
    return """
    WITH probes AS (
      SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pvec
      FROM embeddings WHERE vec_id < 20
    ), scored AS (
      SELECT p.probe_id, e.vec_id,
             ROUND(list_cosine_similarity(e.embedding::DOUBLE[], p.pvec), 6) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY p.probe_id
                ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], p.pvec), 6) DESC,
                         e.vec_id ASC) AS rn
      FROM embeddings e, probes p
      WHERE e.vec_id != p.probe_id
    )
    SELECT probe_id, vec_id AS nn_id, cosine FROM scored WHERE rn = 1
    ORDER BY probe_id
    """


NEAR_DUP_COSINE = 0.35


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= 0.35).

    At test scale this is the exact all-pairs computation (the oracle);
    at 10^12 rows the same predicate runs over LSH-bucketed candidates
    (``lsh_buckets`` self-join) instead of the cross join — same rerank
    expression, linear candidate generation.
    """
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("ea"), F.col("eb"))
                / (_norm(F.col("ea")) * _norm(F.col("eb"))),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= NEAR_DUP_COSINE)
        .orderBy("vec_a", "vec_b")
    )


def embedding_near_dup_oracle() -> str:
    # filter on the ROUNDED value, matching the Spark side exactly
    return f"""
    SELECT * FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
    WHERE cosine >= {NEAR_DUP_COSINE}
    ORDER BY vec_a, vec_b
    """


def _hyperplanes(dim: int) -> np.ndarray:
    rng = np.random.RandomState(LSH_SEED)
    return rng.standard_normal((N_HYPERPLANES, dim)).astype(np.float64)


_BUCKET_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("bucket", StringType(), False),
    ]
)


def lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane sign buckets, vectorized over Arrow batches."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            if planes is None:
                planes = _hyperplanes(mat.shape[1])
            signs = (mat @ planes.T) > 0  # [n, planes]
            keys = [
                "".join("1" if s else "0" for s in row) for row in signs
            ]
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].astype("int64"), "bucket": keys}
            )

    return emb.mapInPandas(run, schema=_BUCKET_SCHEMA)


def _hamming1_probes(bucket_bits: str) -> List[str]:
    out = [bucket_bits]
    for i in range(len(bucket_bits)):
        flipped = (
            bucket_bits[:i]
            + ("0" if bucket_bits[i] == "1" else "1")
            + bucket_bits[i + 1:]
        )
        out.append(flipped)
    return out


def lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 for the query vector via multi-probe LSH + exact rerank.

    Plan shape: bucket table (linear scan, one narrow stage) -> filter to
    the query's probe buckets (partition-prunable at scale if the bucket
    table is written partitioned by bucket prefix) -> exact cosine rerank
    on the candidate slice only.
    """
    emb = load(spark, sf_dir, "embeddings")
    buckets = lsh_buckets(spark, sf_dir)
    qrow = (
        buckets.filter(F.col("vec_id") == QUERY_VEC_ID).select("bucket").collect()
    )
    probes = _hamming1_probes(qrow[0]["bucket"])
    cand = buckets.filter(F.col("bucket").isin(probes)).select("vec_id")
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec")
    )
    return (
        emb.join(cand, "vec_id", "left_semi")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("qvec"))
                / (_norm(F.col("embedding")) * _norm(F.col("qvec"))),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOPK)
    )
