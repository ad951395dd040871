"""spark-submit entrypoint (north rule: `spark-submit --py-files` on a
multi-executor cluster).

Usage:
    python tools/make_pyfiles.py                 # build dist/pegasus_spark.zip
    spark-submit --py-files dist/pegasus_spark.zip tools/submit_crawl.py \
        --web-dir <dir> --job-dir <dir> [--corpus-size N] [--resume] \
        [--min-delay-ms 2000] [--round-width-vt W] [--seen-parts P]

In the sandbox (no cluster manager) the same file runs under
`spark-submit --master local[N]`; on a real cluster only --master and
executor sizing change — the job itself is cluster-agnostic (no
driver-side state that grows with the frontier; see tables.py notes).
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--web-dir", required=True)
    ap.add_argument("--job-dir", required=True)
    ap.add_argument("--corpus-size", type=int, default=None)
    ap.add_argument("--min-delay-ms", type=int, default=2000)
    ap.add_argument("--round-width-vt", type=int, default=None)
    ap.add_argument("--seen-parts", type=int, default=8)
    ap.add_argument("--host-buckets", type=int, default=32)
    ap.add_argument("--max-rounds", type=int, default=10_000)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-validate", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("pegasus-spark-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from pegasus_spark.config import CrawlConfig
    from pegasus_spark.crawl import crawl

    cfg = CrawlConfig(
        web_dir=args.web_dir,
        job_dir=args.job_dir,
        corpus_size=args.corpus_size,
        min_delay_ms=args.min_delay_ms,
        round_width_vt=args.round_width_vt,
        seen_parts=args.seen_parts,
        host_buckets=args.host_buckets,
        max_rounds=args.max_rounds,
        validate_payloads=not args.no_validate,
    )
    res = crawl(spark, cfg, resume=args.resume)
    print(json.dumps({
        "rounds": res.rounds,
        "visited": res.visited,
        "stop_reason": res.stop_reason,
    }))


if __name__ == "__main__":
    main()
