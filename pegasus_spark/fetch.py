"""Fetch + payload validation (SURVEY.md §2 O6/O7).

shriphani/pegasus fetches with ``clj-http.client/get`` inside its
fetcher stage (``src/pegasus/defaults.clj`` — symbol cite per SURVEY.md
§0). The sandbox has no network, so "the web" is the deterministic
``pages`` table and fetch = an equi-join on ``url_hash`` — but the stage
keeps a UDF-shaped boundary so a real batched HTTP client slots in.

Payload validation is the graft-specific replacement for body parsing
(BASELINE.json input_hint): decode the image ``bytes``, require
bit-exact pixels for lossless ``png``, PSNR ≥ 40 dB for lossy ``qnt``,
caption equality, and a matching ``phash`` — evaluated in ONE
Arrow-batched pandas UDF (numpy per image inside the batch; no per-row
Python UDFs). The fetch/decode stage is the CPU-heavy part of a round,
so it runs AFTER all drops (robots/seen/politeness) and is re-shuffled
on the salted ``host_bucket``, not ``host`` — a hot host spreads over B
buckets instead of pinning one task (north-rule skew handling).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from . import codec
from .codec import phash as _phash, psnr as _psnr

PAGE_COLS = [
    "url_hash", "image_id", "bytes", "w", "h", "fmt",
    "caption", "phash", "out_links", "pixels_ref",
]


def load_pages(spark: SparkSession, web_dir: str) -> DataFrame:
    return spark.read.parquet(f"{web_dir}/pages.parquet").select(*PAGE_COLS)


from pyspark.sql.types import BooleanType, DoubleType, StructField, StructType

_validate_schema = StructType([
    StructField("valid", BooleanType()),
    StructField("psnr", DoubleType()),
])


@F.pandas_udf(_validate_schema)
def validate_payload(
    data: pd.Series, fmt: pd.Series, w: pd.Series, h: pd.Series,
    pixels_ref: pd.Series, phash_ref: pd.Series,
) -> pd.DataFrame:
    n = len(data)
    valid = np.zeros(n, dtype=bool)
    psnr_out = np.full(n, np.nan)
    for i in range(n):  # numpy per image; Arrow batch transport
        try:
            dec = codec.decode(data.iloc[i], fmt.iloc[i])
            ref = np.frombuffer(pixels_ref.iloc[i], dtype=np.uint8).reshape(
                int(h.iloc[i]), int(w.iloc[i]), 3
            )
            p = _psnr(dec, ref)
            psnr_out[i] = min(p, 99.0) if np.isfinite(p) else 99.0
            pixel_ok = (
                np.array_equal(dec, ref) if fmt.iloc[i] == "png" else p >= 40.0
            )
            valid[i] = bool(pixel_ok and _phash(ref) == int(phash_ref.iloc[i]))
        except Exception:
            valid[i] = False
    return pd.DataFrame({"valid": valid, "psnr": psnr_out})


def fetch_and_validate(
    selected: DataFrame,
    pages: DataFrame,
    host_buckets: int,
    validate: bool = True,
    selection_count: int | None = None,
    broadcast_max: int = 2_000_000,
) -> DataFrame:
    """Join selected frontier rows against the page store and validate.

    Missing pages (dangling links that slipped in as seeds) behave as
    HTTP 404: the URL still counts as visited (pegasus marks it visited
    too), payload columns are null, valid=false.
    """
    # host_bucket is a lineage/metrics column; the PHYSICAL skew-spread of
    # the decode stage comes for free from hash partitioning on url_hash —
    # uniform regardless of host skew, so one hot host's pages spread
    # evenly across tasks.
    salted = selected.withColumn(
        "host_bucket",
        F.pmod(F.xxhash64("host"), F.lit(host_buckets)).cast("int"),
    )
    # Size-gated join strategy. Small rounds (the politeness-bounded norm)
    # broadcast the selection INTO the store — map-side join, the store is
    # never shuffled. Rounds past broadcast_max rows (10^7-10^8-URL rounds
    # at the 10^10 design point would blow the broadcast ceiling) fall
    # back to a co-partitioned shuffle join on url_hash instead. When the
    # caller doesn't know the count (selection_count=None) it broadcasts:
    # that path only exists for politeness-bounded selections. At real
    # scale "pages" is HTTP and fetch is a mapInPandas over the selection
    # only; the page store here is the sandbox network stand-in.
    small = selection_count is None or selection_count <= broadcast_max
    sel_in = F.broadcast(salted) if small else salted
    keys_in = F.broadcast(pages.select("url_hash")) if small else pages.select("url_hash")
    inner = pages.join(sel_in, "url_hash", "inner")
    missing = salted.join(keys_in, "url_hash", "left_anti")
    joined = inner.unionByName(missing, allowMissingColumns=True)
    if validate:
        joined = joined.withColumn(
            "_v",
            validate_payload("bytes", "fmt", "w", "h", "pixels_ref", "phash"),
        ).select(
            "*",
            F.coalesce(F.col("_v.valid"), F.lit(False)).alias("valid"),
            F.col("_v.psnr").alias("psnr"),
        ).drop("_v")
    else:
        joined = joined.withColumn("valid", F.col("bytes").isNotNull()).withColumn(
            "psnr", F.lit(None).cast("double")
        )
    return joined.drop("pixels_ref")
