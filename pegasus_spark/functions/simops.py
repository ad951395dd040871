"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force cosine top-k — JVM built-ins only
  (``zip_with`` dot product + ``aggregate`` sum), the exact baseline.
- ``lsh_bucket_topk``: random-hyperplane (SimHash) LSH-bucketed ANN — the
  scale path: candidates are only compared within their bucket, so the
  shuffle is on bucket keys and per-task work is bucket-local. Recall is
  tunable via n_planes/n_tables.
- ``simhash64``: 64-bit SimHash of text via a vectorized pandas UDF
  (numpy matrix ops per Arrow batch).
- ``embedding_near_dup_pairs``: near-duplicate pairs by cosine within
  blocking keys (label or LSH bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.
    One scan + a k-row global top (Spark's sort-limit is a per-partition
    top-k + driver merge, not a global sort)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine_col(F.col(vec_col).cast("array<double>"), q), 4).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def _plane_matrix(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes)).astype(np.float64)


def lsh_bucket_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """Vectorized random-hyperplane bucket id: sign-bit pattern of the
    embedding projected on n_planes fixed planes → long bucket key."""
    planes = _plane_matrix(dim, n_planes, seed)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(LongType())
    def bucket(emb: pd.Series) -> pd.Series:
        m = np.vstack(emb.to_numpy())  # (batch, dim)
        bits = (m @ planes) > 0
        return pd.Series(bits @ weights)

    return bucket


def lsh_bucket_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    n_planes: int = 8, seed: int = 42) -> DataFrame:
    """ANN: score only vectors in the query's LSH bucket. At 100 TB the
    bucket column is precomputed+partitioned-by at write time, so a query
    touches one partition instead of the full table."""
    dim = len(query_vec)
    bucket = lsh_bucket_udf(dim, n_planes, seed)
    planes = _plane_matrix(dim, n_planes, seed)
    qbits = (np.asarray(query_vec, dtype=np.float64) @ planes) > 0
    qbucket = int(qbits @ (1 << np.arange(n_planes)).astype(np.int64))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = df.withColumn("_bucket", bucket(F.col(vec_col))).filter(
        F.col("_bucket") == F.lit(qbucket)
    )
    return (
        cand.select(
            F.col(id_col),
            F.round(cosine_col(F.col(vec_col).cast("array<double>"), q), 4).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.3,
                             vec_col: str = "embedding", id_col: str = "vec_id",
                             block_col: str = "label") -> DataFrame:
    """Near-dup pairs by cosine, blocked on ``block_col`` so the join is
    bucket-local (at scale: LSH bucket instead of label)."""
    base = df.select(
        F.col(id_col), F.col(block_col).alias("_blk"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    a, b = base.alias("a"), base.alias("b")
    cos = cosine_col(F.col("a._v"), F.col("b._v"))
    return (
        a.join(b, F.col("a._blk") == F.col("b._blk"))
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cos, 4).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def simhash64(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash of whitespace tokens (vectorized pandas UDF:
    per-token 64-bit hashes via numpy, sign-summed per doc)."""

    @F.pandas_udf(LongType())
    def sh(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        bit_idx = np.arange(64, dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = np.array((t or "").lower().split(), dtype=object)
            if len(toks) == 0:
                continue
            hs = np.array([hash_token(x) for x in toks], dtype=np.uint64)
            bits = ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
            acc = (2 * bits - 1).sum(axis=0)
            v = np.uint64(0)
            for b in range(64):
                if acc[b] > 0:
                    v |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(v)
        return pd.Series(out)

    def hash_token(tok: str) -> int:
        # FNV-1a 64 — deterministic across processes (unlike Python hash())
        h = 0xCBF29CE484222325
        for ch in tok.encode("utf-8"):
            h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    return df.withColumn("simhash", sh(F.col(text_col)))


def simhash_near_dup_pairs(df: DataFrame, text_col: str = "text",
                           max_hamming: int = 7, band_bits: int = 8) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit simhash into 64/band_bits
    bands, bucket-join on bands, verify Hamming distance with bit_count
    (JVM-side). Pigeonhole: a pair within Hamming distance < #bands must
    share ≥1 exact band, so recall is exact only when
    ``max_hamming < 64 // band_bits`` — enforced here (defaults: 8 bands
    of 8 bits cover max_hamming=7)."""
    n_bands = 64 // band_bits
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs > {max_hamming} bands for the "
            f"pigeonhole guarantee; band_bits={band_bits} gives only {n_bands}"
        )
    sh = simhash64(df, text_col).select("doc_id", "simhash")
    mask = (1 << band_bits) - 1
    bands = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_id"),
                     F.shiftright("simhash", b * band_bits).bitwiseAND(F.lit(mask))
                     .alias("band_val"))
            for b in range(n_bands)
        ])).alias("band"),
    ).select("doc_id", "simhash", "band.band_id", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, ["band_id", "band_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
