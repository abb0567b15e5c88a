"""Similarity search over embedding columns (array<float>).

Two paths, mirroring the index engine's design split:

- :func:`cosine_topk` — brute-force exact top-k, pure built-ins
  (``F.zip_with`` dot product + TakeOrderedAndProject). The correctness
  baseline; also the right plan when the query set is small.
- :func:`lsh_cosine_topk` — the scale path: random-hyperplane LSH
  bucketing (sign bits via a vectorized pandas UDF matmul), candidate
  union over multi-probe buckets, exact re-score of candidates only.
  Recall<1.0 by construction; the test suite measures it against brute.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int, *,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k against one query vector. Plans as a narrow scan
    + TakeOrderedAndProject — no shuffle beyond the final k-merge."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.linalg.norm(query_vec))
    v = F.col(vec_col)
    cos = _dot(v, q) / (_norm(v) * F.lit(qn))
    return (emb.select(F.col(id_col).alias("vec_id"), cos.alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(k))


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def bucket_ids(emb: DataFrame, planes: np.ndarray, *,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, bucket) — sign-bit bucket under random hyperplanes.
    Vectorized: one matmul per Arrow batch."""
    planes_b = planes  # captured by closure; small (n_planes × dim)
    schema = StructType([StructField("vec_id", LongType()),
                         StructField("bucket", LongType())])

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.vstack(pdf[vec_col].to_numpy())
            bits = (M @ planes_b.T) > 0
            buck = np.zeros(len(pdf), dtype=np.int64)
            for i in range(planes_b.shape[0]):
                buck |= bits[:, i].astype(np.int64) << i
            yield pd.DataFrame({"vec_id": pdf[id_col].astype("int64"),
                                "bucket": buck})

    return emb.select(id_col, vec_col).mapInPandas(assign, schema)


def lsh_cosine_topk(emb: DataFrame, query_vec: list[float], k: int, *,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 12, n_probe_bits: int = 2,
                    seed: int = 42) -> DataFrame:
    """ANN top-k: restrict exact scoring to vectors whose LSH bucket is
    within ``n_probe_bits`` bit flips of the query's bucket (multi-probe),
    then exact cosine on the candidates. At 100 TB the bucket column is a
    partition key → partition pruning makes the probe a tiny scan."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = hyperplanes(len(q), n_planes, seed)
    qbits = ((planes @ q) > 0).astype(np.int64)
    qbucket = int((qbits << np.arange(n_planes)).sum())

    # multi-probe: all buckets within hamming distance n_probe_bits
    probes = {qbucket}
    if n_probe_bits >= 1:
        probes |= {qbucket ^ (1 << i) for i in range(n_planes)}
    if n_probe_bits >= 2:
        probes |= {qbucket ^ (1 << i) ^ (1 << j)
                   for i in range(n_planes) for j in range(i + 1, n_planes)}

    buckets = bucket_ids(emb, planes, id_col=id_col, vec_col=vec_col)
    cand_ids = (buckets.filter(F.col("bucket").isin(list(probes)))
                .select(F.col("vec_id").alias("__cand_id")))
    cand = emb.join(cand_ids.hint("broadcast"),
                    emb[id_col] == cand_ids["__cand_id"], "left_semi")
    return cosine_topk(cand, query_vec, k, id_col=id_col, vec_col=vec_col)


def embedding_near_dup_pairs(emb: DataFrame, *, threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             n_planes: int = 12, seed: int = 42,
                             max_bucket: int = 2000) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: bucket by hyperplane signs,
    exact cosine within buckets only (candidate recall measured in tests).
    Returns (id_a, id_b, cosine ≥ threshold)."""
    sample = emb.select(vec_col).first()
    dim = len(sample[0])
    planes = hyperplanes(dim, n_planes, seed)
    b = bucket_ids(emb, planes, id_col=id_col, vec_col=vec_col)
    withb = emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v")) \
               .join(b, F.col("vid") == b["vec_id"]).drop("vec_id")
    grouped = (withb.groupBy("bucket")
               .agg(F.collect_list(F.struct("vid", "v")).alias("xs"),
                    F.count("*").alias("sz"))
               .filter((F.col("sz") > 1) & (F.col("sz") <= max_bucket)))
    pairs = (grouped.select(F.explode("xs").alias("a"), "xs")
             .select("a", F.explode("xs").alias("b"))
             .filter(F.col("a.vid") < F.col("b.vid")))
    cos = (_dot(F.col("a.v"), F.col("b.v"))
           / (_norm(F.col("a.v")) * _norm(F.col("b.v"))))
    return (pairs.select(F.col("a.vid").alias("id_a"),
                         F.col("b.vid").alias("id_b"),
                         cos.alias("cosine"))
            .filter(F.col("cosine") >= threshold)
            .distinct())
