"""robots.txt gate (SURVEY.md §2 O5).

shriphani/pegasus fetches+parses robots.txt per host, caches it in an
LMDB robots cache, and filters disallowed URLs before fetch
(``src/pegasus/defaults.clj`` robots filtering — symbol cite per
SURVEY.md §0). Here the per-host rules live in a small ``robots`` table
(the sandbox fixture is the pre-fetched cache; a real deployment fills
it with a robots-fetch sub-batch). Matching is longest-prefix
allow/disallow over the ``rules`` array, evaluated as an Arrow-batched
pandas UDF against broadcast rules — the robots side is always tiny
relative to the frontier, so it never shuffles the candidate set.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def load_rules(spark: SparkSession, robots_path: str) -> dict[str, list[tuple[bool, str]]]:
    """host → rules sorted by prefix length desc (longest match wins).
    Unknown host ⇒ allow-all (matching the reference's default)."""
    rows = spark.read.parquet(robots_path).select("host", "rules").collect()
    out: dict[str, list[tuple[bool, str]]] = {}
    for r in rows:
        rules = [(x["allow"], x["prefix"]) for x in (r["rules"] or [])]
        rules.sort(key=lambda t: len(t[1]), reverse=True)
        out[r["host"]] = rules
    return out


def load_crawl_delays(spark: SparkSession, robots_path: str) -> DataFrame:
    return spark.read.parquet(robots_path).select(
        "host", F.col("crawl_delay_ms").cast("long").alias("crawl_delay_ms")
    )


def allowed_filter(
    spark: SparkSession, rules: dict[str, list[tuple[bool, str]]]
) -> "F.udf":
    """Returns a pandas UDF ``allowed(host, path) -> boolean``.

    Vectorized: per unique host in the Arrow batch (few), each rule
    prefix is tested with a vectorized ``str.startswith`` in longest-
    first order; first match decides, default allow.
    """
    b = spark.sparkContext.broadcast(rules)

    @F.pandas_udf("boolean")
    def allowed(host: pd.Series, path: pd.Series) -> pd.Series:
        import numpy as np

        res = np.ones(len(host), dtype=bool)
        hv = host.to_numpy()
        rmap = b.value
        for h in pd.unique(host.dropna()):
            rs = rmap.get(h)
            if not rs:
                continue
            mask = hv == h
            sub = path[mask].fillna("/")
            decided = np.zeros(mask.sum(), dtype=bool)
            verdict = np.ones(mask.sum(), dtype=bool)
            for allow, prefix in rs:  # longest prefix first
                hit = sub.str.startswith(prefix).to_numpy(dtype=bool) & ~decided
                verdict[hit] = allow
                decided |= hit
            res[mask] = verdict
        return pd.Series(res, index=host.index)

    return allowed


def path_of(col):
    """Path+query of a canonical URL, JVM-side (no UDF)."""
    return F.regexp_replace(col, r"^[a-z][a-z0-9+.-]*://[^/]*", "")


def allowed_one(rules: dict[str, list[tuple[bool, str]]], host: str, path: str) -> bool:
    """Scalar twin for the oracle simulator — same longest-prefix spec."""
    rs = rules.get(host)
    if not rs:
        return True
    for allow, prefix in rs:
        if path.startswith(prefix):
            return allow
    return True
