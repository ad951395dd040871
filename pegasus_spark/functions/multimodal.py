"""Multimodal (image/audio/video) column operators.

Payloads are opaque ``binary`` columns with typed metadata — exactly the
corpus schema the crawl engine produces (image_id, bytes, w, h, fmt,
caption, phash). Image decode is REAL here (pegasus_spark.codec:
numpy+zlib PNG / QNT — no Pillow in the env); audio/video decode are
STUBBED behind NotImplementedError with the Spark-side plumbing (schema,
mapInPandas batch shape, partitioning) real and tested.

All operators are ``mapInPandas``/``pandas_udf`` over Arrow batches.
Scale note: decode-heavy stages should be repartitioned on a salted key
first (see fetch.py) so one large partition can't pin a task; batch
memory is bounded by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codec

IMAGE_FEATURES_DDL = (
    "image_id string, w int, h int, fmt string, mean_r double, mean_g double, "
    "mean_b double, brightness double, phash long, decode_ok boolean"
)


def image_features(df: DataFrame) -> DataFrame:
    """Decode image bytes and extract cheap features (channel means,
    brightness, recomputed phash). Real decode via pegasus_spark.codec."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "image_id": pdf["image_id"], "w": pdf["w"], "h": pdf["h"],
                "fmt": pdf["fmt"],
                "mean_r": np.full(n, np.nan), "mean_g": np.full(n, np.nan),
                "mean_b": np.full(n, np.nan), "brightness": np.full(n, np.nan),
                "phash": np.zeros(n, dtype=np.int64),
                "decode_ok": np.zeros(n, dtype=bool),
            }
            for i in range(n):
                try:
                    px = codec.decode(pdf["bytes"].iloc[i], pdf["fmt"].iloc[i])
                    m = px.astype(np.float64).mean(axis=(0, 1))
                    out["mean_r"][i], out["mean_g"][i], out["mean_b"][i] = np.round(m, 4)
                    out["brightness"][i] = round(float(m.mean()), 4)
                    out["phash"][i] = codec.phash(px)
                    out["decode_ok"][i] = True
                except Exception:
                    pass
            yield pd.DataFrame(out)

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        gen, schema=IMAGE_FEATURES_DDL
    )


def image_resize(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize → re-encoded PNG bytes (real, numpy)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                try:
                    px = codec.decode(pdf["bytes"].iloc[i], pdf["fmt"].iloc[i])
                    ys = (np.arange(out_h) * px.shape[0]) // out_h
                    xs = (np.arange(out_w) * px.shape[1]) // out_w
                    small = px[ys][:, xs]
                    rows.append((pdf["image_id"].iloc[i], codec.png_encode(small),
                                 out_w, out_h, "png"))
                except Exception:
                    rows.append((pdf["image_id"].iloc[i], None, out_w, out_h, "png"))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        gen, schema="image_id string, bytes binary, w int, h int, fmt string"
    )


def phash_near_dup_pairs(df: DataFrame, max_hamming: int = 6,
                         band_bits: int = 16) -> DataFrame:
    """Image near-dup pairs by perceptual-hash Hamming distance, using the
    same band-bucket-join pattern as simhash (no O(n²)): JVM-side only."""
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    bands = df.select("image_id", "phash").select(
        "image_id", "phash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_id"),
                     F.shiftright("phash", b * band_bits).bitwiseAND(F.lit(mask))
                     .alias("band_val"))
            for b in range(n_bands)
        ])).alias("band"),
    ).select("image_id", "phash", "band.band_id", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    return (
        a.join(b, ["band_id", "band_val"])
        .where(F.col("a.image_id") < F.col("b.image_id"))
        .select(F.col("a.image_id").alias("id_a"), F.col("b.image_id").alias("id_b"),
                ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---- stubbed modalities (no audio/video libs in this container) --------

AUDIO_FEATURES_DDL = "clip_id string, duration_s double, sample_rate int, rms double"


def audio_features(df: DataFrame) -> DataFrame:
    """Audio feature extraction — STUB. The Spark plumbing (schema, Arrow
    batching) is real; the decoder raises until a codec library exists."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "audio decode requires an audio codec library not present in "
            "this environment; plug a decoder into this mapInPandas body"
        )
        yield  # pragma: no cover

    return df.mapInPandas(gen, schema=AUDIO_FEATURES_DDL)


def video_frame_sample(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling — STUB (same contract as audio_features)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "video decode requires a video codec library not present in "
            "this environment; plug a decoder into this mapInPandas body"
        )
        yield  # pragma: no cover

    return df.mapInPandas(gen, schema="video_id string, frame_no int, frame_png binary")
