"""Round-6 optimization measurement harness (guide §1) — bench.py stays
FROZEN for the driver; every extra number cited in OPTIMIZATION_r06.md
comes from here.

Modes (PEGASUS_EXTRA_MODE):
- ``queries`` (default): the entry-query suite alone, timed through the
  noop sink with bench.py's exact methodology (same make_spark, same
  warm-up pass, same per-query ordering), repeated
  ``PEGASUS_EXTRA_PASSES`` times in ONE session; reports per-query
  times for every pass plus the min/median — isolates query-level
  optimizations from the crawl and from host drift.
- ``crawl``: one headline BFS crawl pass in-process (the bench.py
  "crawl" subprocess body) with per-round laps.

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mode = os.environ.get("PEGASUS_EXTRA_MODE", "queries")
    n_passes = int(os.environ.get("PEGASUS_EXTRA_PASSES", "3"))

    spark = bench.make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "crawl":
        n_pages = int(os.environ.get(
            "PEGASUS_BENCH_PAGES", max(500, int(100_000 * bench._sf_of(sf_dir)))))
        stats = bench.crawl_bench(spark, n_pages, verbose=True)
        print(json.dumps({"metric": "crawl_only_sec", "unit": "sec",
                          "value": stats["crawl_sec"], "cpus": cpus, **stats}))
        return

    passes = []
    for i in range(n_passes):
        t0 = time.monotonic()
        times = bench.query_bench(spark, sf_dir)
        passes.append(times)
        print(f"# pass {i}: total {round(time.monotonic() - t0, 2)}s "
              f"(sum {round(sum(times.values()), 2)}s)", file=sys.stderr)
    names = list(passes[0])
    med = {n: sorted(p[n] for p in passes)[n_passes // 2] for n in names}
    mn = {n: min(p[n] for p in passes) for n in names}
    print(json.dumps({
        "metric": "query_suite_sec", "unit": "sec",
        "value": round(sum(med.values()), 2),
        "value_min": round(sum(mn.values()), 2),
        "queries_median": med, "queries_min": mn,
        "queries_passes": passes, "sf_dir": sf_dir, "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
