"""Virtual-time politeness schedule unit tests (SURVEY.md §2 O3)."""

import pytest
from pyspark.sql import functions as F

from pegasus_spark import politeness


def _pending(spark, rows):
    # (url, url_hash, host, priority, discovered_round, crawl_delay_ms)
    return spark.createDataFrame(
        rows,
        "url string, url_hash long, host string, priority int, "
        "discovered_round int, crawl_delay_ms long",
    )


def _hosts(spark, rows):
    return spark.createDataFrame(rows, "host string, next_vt long")


def test_budget_per_host_and_fifo_order(spark):
    rows = [(f"u{i}", i, "a", 0, 0, None) for i in range(10)]
    out = politeness.schedule(
        _pending(spark, rows), _hosts(spark, []), 0, 8000, 2000
    ).toPandas().sort_values("rn")
    # W/delay = 4 fetches fit: vt 0,2000,4000,6000
    sel = out[out["selected"]]
    assert list(sel["url_hash"]) == [0, 1, 2, 3]
    assert list(sel["fetch_vt"]) == [0, 2000, 4000, 6000]
    assert (~out[out["rn"] > 4]["selected"]).all()


def test_crawl_delay_overrides_min_delay(spark):
    rows = [(f"u{i}", i, "a", 0, 0, 4000) for i in range(5)]
    out = politeness.schedule(
        _pending(spark, rows), _hosts(spark, []), 0, 8000, 2000
    ).toPandas()
    sel = out[out["selected"]].sort_values("rn")
    assert list(sel["fetch_vt"]) == [0, 4000]  # only 2 fit at 4s delay


def test_host_clock_defers_start(spark):
    rows = [("u0", 0, "a", 0, 0, None), ("u1", 1, "a", 0, 0, None)]
    out = politeness.schedule(
        _pending(spark, rows), _hosts(spark, [("a", 7000)]), 0, 8000, 2000
    ).toPandas().sort_values("rn")
    # t0 = max(0, 7000) → first at 7000 (fits), second at 9000 (deferred)
    assert list(out["fetch_vt"]) == [7000, 9000]
    assert list(out["selected"]) == [True, False]


def test_priority_then_discovery_then_hash_ordering(spark):
    rows = [
        ("x", 50, "a", 1, 0, None),   # depth 1 → after depth 0
        ("y", 99, "a", 0, 1, None),   # depth 0, later discovery
        ("z", 10, "a", 0, 0, None),   # depth 0, round 0, smallest hash
        ("w", 20, "a", 0, 0, None),
    ]
    out = politeness.schedule(
        _pending(spark, rows), _hosts(spark, []), 0, 100000, 2000
    ).toPandas().sort_values("rn")
    assert list(out["url_hash"]) == [10, 20, 99, 50]


def test_hosts_independent(spark):
    rows = [(f"u{i}", i, h, 0, 0, None) for h in ("a", "b") for i in range(3)]
    out = politeness.schedule(
        _pending(spark, rows), _hosts(spark, []), 0, 8000, 2000
    ).toPandas()
    assert out["selected"].all()  # 3 per host fit in 4-slot budget
    for h in ("a", "b"):
        assert list(out[out["host"] == h].sort_values("rn")["fetch_vt"]) == [0, 2000, 4000]


def test_next_host_state_advances_only_fetched(spark):
    rows = [(f"u{i}", i, "a", 0, 0, None) for i in range(6)]
    sched = politeness.schedule(
        _pending(spark, rows), _hosts(spark, [("a", 0), ("b", 5000)]), 0, 8000, 2000
    )
    ns = politeness.next_host_state(sched.filter("selected"), _hosts(spark, [("a", 0), ("b", 5000)]))
    got = {r["host"]: r["next_vt"] for r in ns.collect()}
    assert got["a"] == 6000 + 2000  # last fetch 6000 + delay
    assert got["b"] == 5000  # untouched host keeps its clock
