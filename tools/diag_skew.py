"""Quantify the politeness-selection skew bound (VERDICT r2 item 9 / r3 #1).

Selection is two-stage (politeness.py): a per-(host, salt) partial top-K
prune, then the exact per-host window on the survivors. This script
measures, on a Zipf-heavy fixture with EVERY page pending at once (the
worst case — a hot host owning most of the frontier):

  stage1_window: rows per (host,salt)-shuffle partition — the only
      shuffle that sees the full pending set; max share should be
      ~hottest_host_share / salt_buckets.
  stage2_window: rows per host-shuffle partition of the PRUNED set —
      budget-bounded (≤ salt_buckets · ⌈W/delay⌉ per host), so both its
      absolute size and its skew are independent of frontier size.
  decode: rows per decode-stage partition (hash(url_hash) — ~uniform).

Usage: python tools/diag_skew.py [n_pages] [zipf_s] [round_width_vt]
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
    # realistic round horizon: W/delay = 8 fetch slots per host per round
    round_width = int(sys.argv[3]) if len(sys.argv) > 3 else 16_000
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

    salt_buckets = 32
    cand = politeness._with_delay(pending, host_state, 2000)
    survivors, _ = politeness._prune_to_horizon(cand, 0, round_width, salt_buckets)
    # stage 1: the (host,salt) exchange feeding the prune window — the
    # only shuffle keyed on the full pending set
    salted = cand.withColumn(
        "_salt", F.pmod(F.col("url_hash"), F.lit(salt_buckets)).cast("int")
    ).repartition(shuffle_parts, "host", "_salt")
    stage1_dist = dist(salted.select("host"))
    # stage 2: the host exchange over the PRUNED set
    stage2_dist = dist(survivors.repartition(shuffle_parts, "host").select("host"))

    sched = politeness.schedule(pending, host_state, 0, round_width, 2000,
                                salt_buckets=salt_buckets)
    # the decode stage's physical distribution: hash(url_hash) exchange
    decode_in = sched.filter("selected").repartition(shuffle_parts, "url_hash")
    decode_dist = dist(decode_in.select("url_hash"))

    hot = pages.groupBy("host").count().orderBy(F.desc("count")).limit(1).collect()[0]
    out = {
        "n_pages": n_pages, "zipf_s": zipf_s, "round_width_vt": round_width,
        "salt_buckets": salt_buckets, "shuffle_partitions": shuffle_parts,
        "hottest_host_rows": int(hot["count"]),
        "hottest_host_share": round(int(hot["count"]) / n_pages, 4),
        "stage1_window": stage1_dist,
        "stage2_window": stage2_dist,
        "decode_stage": decode_dist,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
