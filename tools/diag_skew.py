"""Quantify the politeness host-window skew bound (VERDICT r2 item 9).

The per-host politeness window is the one shuffle keyed by raw host (a
hot host CANNOT be split there — the rank is per-host sequential); the
expensive fetch/decode stage re-shuffles on hash(url_hash) partitioning,
which is uniform regardless of host skew. This script measures both row
distributions on a Zipf-heavy fixture and prints one JSON line:

  window: rows per window-shuffle partition (max share = the skew bound)
  decode: rows per decode-stage partition (should be ~uniform)

Usage: python tools/diag_skew.py [n_pages] [zipf_s]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def dist(df) -> dict:
    rows = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().collect()
    )
    counts = sorted((int(r["count"]) for r in rows), reverse=True)
    total = sum(counts) or 1
    return {
        "partitions_nonempty": len(counts),
        "rows": total,
        "max_rows": counts[0] if counts else 0,
        "max_share": round(counts[0] / total, 4) if counts else 0.0,
        "p50_rows": counts[len(counts) // 2] if counts else 0,
    }


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    zipf_s = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    shuffle_parts = int(os.environ.get("PEGASUS_SHUFFLE_PARTS", "64"))

    from pegasus_spark import politeness
    from pegasus_spark.fixtures import WebParams, materialize

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("diag-skew")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        # AQE coalescing would merge the small partitions and hide the
        # per-key imbalance this diagnostic is meant to expose
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    params = WebParams(seed=42, n_pages=n_pages, n_hosts=max(20, n_pages // 100),
                       zipf_s=zipf_s, fanout=2.0, img_min=8, img_max=12,
                       n_seeds=n_pages)  # all pages pending at once (worst case)
    web_dir = materialize(
        params, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH", "fixtures"))

    pages = spark.read.parquet(f"{web_dir}/pages.parquet")
    pending = pages.select("url", "url_hash", "host").withColumn(
        "priority", F.lit(0)).withColumn("discovered_round", F.lit(0)).withColumn(
        "crawl_delay_ms", F.lit(None).cast("long"))
    host_state = spark.createDataFrame([], "host string, next_vt long")

    sched = politeness.schedule(pending, host_state, 0, 1 << 60, 2000)
    # the window output partitioning IS the host-hash exchange
    window_dist = dist(sched.select("host"))

    # the decode stage's physical distribution: hash(url_hash) exchange
    decode_in = sched.repartition(shuffle_parts, "url_hash")
    decode_dist = dist(decode_in.select("url_hash"))

    hot = pages.groupBy("host").count().orderBy(F.desc("count")).limit(1).collect()[0]
    out = {
        "n_pages": n_pages, "zipf_s": zipf_s, "shuffle_partitions": shuffle_parts,
        "hottest_host_rows": int(hot["count"]),
        "hottest_host_share": round(int(hot["count"]) / n_pages, 4),
        "window_shuffle": window_dist,
        "decode_stage": decode_dist,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
