"""O5 robots.txt text parsing + mid-crawl discovery.

The reference fetches and parses raw robots.txt per host and honors the
rules for its own user-agent (pegasus ``src/pegasus/defaults.clj``
robots filtering — symbol cite per SURVEY.md §0). These tests pin the
parser spec (RFC 9309 subset), the render→parse roundtrip the fixtures
rely on, and crawl parity between robots_mode='preparsed' (pre-fetched
cache) and robots_mode='discover' (robots-fetch sub-batch per round).
"""

import shutil
import tempfile

from pegasus_spark.config import CrawlConfig
from pegasus_spark.crawl import crawl
from pegasus_spark.fixtures import WebParams, generate_web, render_robots_txt, write_web
from pegasus_spark.robots import parse_robots_text
from pegasus_spark.tables import ManifestCatalog

UA = "pegasus-spark/0.1"


def test_parse_basic_group():
    d, rules = parse_robots_text(
        "User-agent: *\nDisallow: /private\nAllow: /private/ok\nCrawl-delay: 2\n", UA
    )
    assert d == 2000
    assert rules == [(True, "/private/ok"), (False, "/private")]  # longest first


def test_parse_group_selection_prefers_specific_ua():
    body = (
        "User-agent: evilbot\nDisallow: /\n\n"
        "User-agent: pegasus-spark\nDisallow: /secret\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    d, rules = parse_robots_text(body, UA)
    assert rules == [(False, "/secret")]  # not the deny-all groups
    # an unrelated agent falls back to '*'
    d2, rules2 = parse_robots_text(body, "otherbot/9")
    assert rules2 == [(False, "/")]


def test_parse_consecutive_ua_lines_share_group():
    body = "User-agent: a\nUser-agent: pegasus-spark\nDisallow: /x\n"
    _, rules = parse_robots_text(body, UA)
    assert rules == [(False, "/x")]


def test_parse_empty_disallow_and_comments_and_404():
    assert parse_robots_text("User-agent: *\nDisallow:\n", UA) == (None, [])
    assert parse_robots_text("# only comments\n", UA) == (None, [])
    assert parse_robots_text(None, UA) == (None, [])
    assert parse_robots_text("", UA) == (None, [])


def test_parse_fractional_crawl_delay():
    d, _ = parse_robots_text("User-agent: *\nCrawl-delay: 1.5\nDisallow: /a\n", UA)
    assert d == 1500


def test_render_parse_roundtrip():
    rules = [{"allow": True, "prefix": "/"}, {"allow": False, "prefix": "/p/3"}]
    for ua_specific in (False, True):
        body = render_robots_txt(rules, 3000, ua_specific=ua_specific)
        d, parsed = parse_robots_text(body, UA)
        assert d == 3000
        assert parsed == [(False, "/p/3"), (True, "/")]
        # the decoy deny-all groups must never leak into our agent's rules
        assert (False, "/") not in parsed


def test_gate_scales_without_driver_rules_dict(spark):
    """10^4 hosts through the join gate: verdicts match the scalar spec
    (allowed_one) and the driver holds NO rules structure — the gate is a
    DataFrame join + JVM longest-prefix expression end to end."""
    from pyspark.sql import functions as F

    from pegasus_spark.robots import RobotsCache, allowed_one, make_gate, sorted_rules

    n = 10_000
    rules_rows, expect_rules = [], {}
    for k in range(n):
        host = f"h{k}.example"
        # vary rule shapes incl. equal-length prefixes (stable-sort tie)
        rules = [{"allow": True, "prefix": "/"},
                 {"allow": False, "prefix": f"/p/{k % 10}"},
                 {"allow": True, "prefix": f"/q/{k % 10}"}]
        if k % 7 == 0:
            rules = [{"allow": False, "prefix": "/"}]
        rules_rows.append((host, rules))
        expect_rules[host] = sorted(
            [(r["allow"], r["prefix"]) for r in rules],
            key=lambda t: len(t[1]), reverse=True)
    rules_df = spark.createDataFrame(
        rules_rows, "host string, rules array<struct<allow:boolean,prefix:string>>"
    ).select("host", sorted_rules(F.col("rules")).alias("rules"))
    gate = make_gate(rules_df)

    cand = spark.createDataFrame(
        [(f"h{k}.example", f"http://h{k}.example/p/{k % 10}/x") for k in range(0, n, 3)]
        + [(f"h{k}.example", f"http://h{k}.example/q/{k % 10}") for k in range(1, n, 3)]
        + [(f"h{k}.example", f"http://h{k}.example/other") for k in range(2, n, 3)]
        + [("unknown.example", "http://unknown.example/anything")],
        "host string, url string",
    )
    got = {(r["host"], r["url"]): r["allowed"] for r in gate(cand).collect()}
    import re

    for (host, url), allowed in got.items():
        path = re.sub(r"^[a-z][a-z0-9+.-]*://[^/]*", "", url)
        assert allowed == allowed_one(expect_rules, host, path), (host, url)
    # structural guarantee: the discover-mode cache has no dict twin
    assert not hasattr(RobotsCache, "_reload")
    assert "_dict" not in RobotsCache.__init__.__code__.co_names


def test_discover_mode_matches_preparsed_crawl(spark):
    tmp = tempfile.mkdtemp()
    try:
        # disallow+delay-heavy fixture so the robots rules really bind
        params = WebParams(seed=41, n_pages=180, n_hosts=9, n_seeds=3,
                           disallow_host_frac=0.6, crawl_delay_host_frac=0.5)
        web = generate_web(params)
        write_web(web, f"{tmp}/web")
        results = {}
        for mode in ("preparsed", "discover"):
            cfg = CrawlConfig(web_dir=f"{tmp}/web", job_dir=f"{tmp}/{mode}",
                              seen_parts=4, robots_mode=mode,
                              round_width_vt=48_000)
            res = crawl(spark, cfg)
            cat = ManifestCatalog(spark, f"{tmp}/{mode}")
            results[mode] = {
                "visited": res.visited,
                "stop": res.stop_reason,
                "corpus": {tuple(r) for r in cat.read("corpus")
                           .select("url_hash", "fetch_round", "fetch_vt").collect()},
                "seen": {r["url_hash"] for r in cat.read("frontier").select("url_hash").collect()},
            }
        assert results["preparsed"] == results["discover"]
        # and the discover run actually recorded per-host robots rows
        cat = ManifestCatalog(spark, f"{tmp}/discover")
        robots_hosts = {r["host"] for r in cat.read("robots").select("host").collect()}
        corpus_hosts = {r["host"] for r in cat.read("corpus").select("host").collect()}
        assert corpus_hosts <= robots_hosts
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
