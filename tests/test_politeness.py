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


def test_two_stage_prune_matches_one_stage(spark):
    """The salted pre-prune (politeness.py stage 1) must leave the
    selected set, its rn/fetch_vt values, and the output row count
    bit-identical to the one-stage spec. Hashes are laid out so MANY rows
    collide per salt bucket (forcing real pruning at salt_buckets=4) on a
    hot host, with a second cold host and a crawl-delayed third."""
    rows = (
        [(f"a{i}", i * 4, "a", i % 3, i % 2, None) for i in range(60)]  # hot: all salt-0
        + [(f"b{i}", i * 4 + 1, "b", 0, 0, None) for i in range(3)]
        + [(f"c{i}", i * 4 + 2, "c", 0, 0, 4000) for i in range(20)]
    )
    pending = _pending(spark, rows)
    hosts = _hosts(spark, [("a", 3000)])
    out = politeness.schedule(pending, hosts, 0, 8000, 2000, salt_buckets=4).toPandas()
    assert len(out) == len(rows)  # every pending row present exactly once

    # one-stage reference in pandas
    import pandas as pd

    ref = pd.DataFrame(rows, columns=["url", "url_hash", "host", "priority",
                                      "discovered_round", "crawl_delay_ms"])
    next_vt = {"a": 3000}
    sel_ref = {}
    for host, g in ref.groupby("host"):
        g = g.sort_values(["priority", "discovered_round", "url_hash"])
        cd = g["crawl_delay_ms"].iloc[0]
        d = max(2000, 0 if pd.isna(cd) else int(cd))
        t0 = max(0, next_vt.get(host, 0))
        for rn, (_, r) in enumerate(g.iterrows(), start=1):
            vt = t0 + (rn - 1) * d
            if vt < 8000:
                sel_ref[int(r["url_hash"])] = (rn, vt)

    sel = out[out["selected"]]
    got = {int(r.url_hash): (int(r.rn), int(r.fetch_vt)) for r in sel.itertuples()}
    assert got == sel_ref
    # pruned tail: not selected, NULL schedule slots, rows preserved
    tail = out[out["rn"].isna()]
    assert len(tail) > 0  # pruning actually engaged at salt_buckets=4
    assert not tail["selected"].any()
    assert tail["fetch_vt"].isna().all()


def test_next_host_state_advances_only_fetched(spark):
    rows = [(f"u{i}", i, "a", 0, 0, None) for i in range(6)]
    sched = politeness.schedule(
        _pending(spark, rows), _hosts(spark, [("a", 0), ("b", 5000)]), 0, 8000, 2000
    )
    ns = politeness.next_host_state(sched.filter("selected"), _hosts(spark, [("a", 0), ("b", 5000)]))
    got = {r["host"]: r["next_vt"] for r in ns.collect()}
    assert got["a"] == 6000 + 2000  # last fetch 6000 + delay
    assert got["b"] == 5000  # untouched host keeps its clock
