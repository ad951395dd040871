"""robots.txt gate (SURVEY.md §2 O5).

shriphani/pegasus fetches+parses robots.txt per host, caches it in an
LMDB robots cache, and filters disallowed URLs before fetch
(``src/pegasus/defaults.clj`` robots filtering — symbol cite per
SURVEY.md §0). Here the per-host rules live in the versioned ``robots``
table (the sandbox fixture is the pre-fetched cache; a real deployment
fills it with a robots-fetch sub-batch). Matching is longest-prefix
allow/disallow over the ``rules`` array, evaluated as a pure JVM
expression after a host-join against the rules DataFrame — no pandas
UDF, no driver-side rules dict at any host count (see the gate section
below).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def load_crawl_delays(spark: SparkSession, robots_path: str) -> DataFrame:
    return spark.read.parquet(robots_path).select(
        "host", F.col("crawl_delay_ms").cast("long").alias("crawl_delay_ms")
    )


# ---- the gate: a JOIN on host + a JVM longest-prefix expression --------
# Round 2 held every host's rules in a driver dict and broadcast it into
# a pandas UDF — O(hosts) driver memory, rebuilt per version change; a
# 10^7-10^8-host frontier makes that a multi-GB driver structure. Now the
# rules stay a DataFrame end to end: candidates ⟕ rules on host, verdict
# = first matching prefix in a longest-first-sorted rules array, all JVM
# built-ins (filter/element_at/coalesce — whole-stage codegen, no Python,
# no driver materialization). Catalyst's size estimation auto-broadcasts
# the rules side while it is small and falls back to a shuffle join past
# the broadcast threshold — exactly the scale behavior we want, with no
# hand-tuned gate.

def sorted_rules(rules_col):
    """Sort a rules array longest-prefix-first, STABLE (original parse
    order breaks length ties — the same order the scalar oracle
    ``allowed_one`` and the text parser use)."""
    with_key = F.transform(
        rules_col,
        lambda r, i: F.struct(
            (-F.length(r["prefix"])).alias("nl"), i.alias("i"),
            r["allow"].alias("allow"), r["prefix"].alias("prefix"),
        ),
    )
    return F.transform(
        F.array_sort(with_key),
        lambda s: F.struct(s["allow"].alias("allow"), s["prefix"].alias("prefix")),
    )


def allowed_expr(path_col, rules_col):
    """Longest-prefix allow/disallow verdict as a pure JVM expression.
    ``rules_col`` must be longest-first-sorted; null/empty rules (host
    absent from the robots table) ⇒ allow, per the reference default."""
    hit = F.filter(rules_col, lambda r: path_col.startswith(r["prefix"]))
    return F.coalesce(F.element_at(hit, 1)["allow"], F.lit(True))


def load_rules_df(spark: SparkSession, robots_path: str) -> DataFrame:
    """(host, rules) with rules pre-sorted for ``allowed_expr``."""
    return spark.read.parquet(robots_path).select(
        "host", sorted_rules(F.col("rules")).alias("rules")
    )


def make_gate(rules_df: DataFrame):
    """Returns ``gate(df, url_col) -> df + allowed:boolean``. The join is
    on ``host``; the rules side never touches the driver."""

    def gate(df: DataFrame, url_col: str = "url") -> DataFrame:
        return (
            df.join(rules_df, "host", "left")
            .withColumn("allowed", allowed_expr(path_of(F.col(url_col)), F.col("rules")))
            .drop("rules")
        )

    return gate


# ---- raw robots.txt parsing (SURVEY.md §2 O5: "unknown hosts →
# robots-fetch sub-batch first, parse via vectorized Arrow UDF batches").
# pegasus fetches+parses raw robots.txt per host and honors the rules for
# its own user-agent; this is the text→rules half, used by the discover
# mode (robots fetched mid-crawl) and by anyone feeding raw bodies.

def parse_robots_text(
    text: str | None, user_agent: str = "pegasus-spark/0.1"
) -> tuple[int | None, list[tuple[bool, str]]]:
    """Raw robots.txt → (crawl_delay_ms | None, rules longest-prefix-first).

    RFC 9309 subset: ``User-agent`` groups (consecutive UA lines share a
    group), ``Allow``/``Disallow``/``Crawl-delay`` records, ``#`` comments.
    Group selection: the group whose UA token is the longest
    case-insensitive substring match of our product token wins; ``*``
    matches with the lowest specificity; no match ⇒ allow-all. A missing
    / empty body (HTTP 404) ⇒ allow-all, per the de-facto standard."""
    if not text:
        return None, []
    groups: list[tuple[list[str], list[tuple[bool, str]], int | None]] = []
    cur_uas: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    cur_delay: int | None = None
    last_was_ua = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not last_was_ua and cur_uas:
                groups.append((cur_uas, cur_rules, cur_delay))
                cur_uas, cur_rules, cur_delay = [], [], None
            cur_uas.append(val)
            last_was_ua = True
            continue
        last_was_ua = False
        if not cur_uas:
            continue  # RFC 9309: rules outside any User-agent group are ignored
        if key == "disallow":
            if val:  # empty Disallow = allow everything → no rule
                cur_rules.append((False, val))
        elif key == "allow":
            if val:
                cur_rules.append((True, val))
        elif key == "crawl-delay":
            try:
                cur_delay = round(float(val) * 1000)  # exact ms roundtrip
            except ValueError:
                pass
    if cur_uas:
        groups.append((cur_uas, cur_rules, cur_delay))

    token = user_agent.split("/")[0].strip().lower()
    best: tuple[list[tuple[bool, str]], int | None] | None = None
    best_spec = -1
    for uas, rules, delay in groups:
        for ua in uas:
            u = ua.strip().lower()
            spec = 0 if u == "*" else (len(u) if u and u in token else -1)
            if spec > best_spec:
                best_spec, best = spec, (rules, delay)
    if best is None:
        return None, []
    rules, delay = best
    return delay, sorted(rules, key=lambda t: len(t[1]), reverse=True)


_PARSED_TYPE = (
    "struct<crawl_delay_ms:bigint,"
    "rules:array<struct<allow:boolean,prefix:string>>>"
)


def parse_robots_udf(user_agent: str):
    """Vectorized Arrow-batched parser: body:string →
    struct(crawl_delay_ms, rules array) — the robots-fetch sub-batch's
    parse stage. Per-body Python is fine here: robots bodies are one per
    HOST (not per URL), tiny, and parsed exactly once per crawl."""

    @F.pandas_udf(_PARSED_TYPE)
    def parse(body: pd.Series) -> pd.DataFrame:
        delays, rules_out = [], []
        for b in body:
            d, rs = parse_robots_text(b if isinstance(b, str) else None, user_agent)
            delays.append(d)
            rules_out.append([{"allow": a, "prefix": p} for a, p in rs])
        return pd.DataFrame({"crawl_delay_ms": pd.array(delays, dtype="Int64"),
                             "rules": rules_out})

    return parse


ROBOTS_DDL = (
    "host string, fetched_round int, crawl_delay_ms long, "
    "rules array<struct<allow:boolean,prefix:string>>"
)

_ROBOTS_ARROW = None  # built lazily (pyarrow import kept at module scope below)


def _robots_arrow_schema():
    global _ROBOTS_ARROW
    if _ROBOTS_ARROW is None:
        import pyarrow as pa

        _ROBOTS_ARROW = pa.schema([
            ("host", pa.string()), ("fetched_round", pa.int32()),
            ("crawl_delay_ms", pa.int64()),
            ("rules", pa.list_(pa.struct([("allow", pa.bool_()),
                                          ("prefix", pa.string())]))),
        ])
    return _ROBOTS_ARROW


class RobotsCache:
    """Robots discovered mid-crawl (pegasus semantics: fetch+parse
    robots.txt the first time a host is touched, cache forever).

    The cache is the versioned ``robots`` table, nothing else — the gate
    reads it as a DataFrame (``rules_df``/``gate``), so the driver never
    holds a rules structure at any host count. ``ensure`` runs the
    robots-fetch sub-batch: unknown hosts ⟕ raw bodies (the sandbox
    network stand-in; a real deployment fetches ``host/robots.txt``
    here) → vectorized parse UDF → append. Small batches (the norm: new
    hosts per round) collect + local-append to skip a Spark write job;
    batches past ``local_append_max`` rows append executor-side."""

    def __init__(self, spark: SparkSession, cat, raw_df: DataFrame, user_agent: str,
                 local_append_max: int = 20_000):
        self.spark = spark
        self.cat = cat
        self.raw = raw_df
        self.user_agent = user_agent
        self.local_append_max = local_append_max
        cat.create("robots", ROBOTS_DDL)

    def ensure(self, hosts_df: DataFrame, rnd: int) -> int:
        """Fetch+parse robots for hosts not yet cached. Returns how many
        new hosts were discovered."""
        known = self.cat.read("robots").select("host")
        unknown = hosts_df.select("host").distinct().join(known, "host", "left_anti")
        parse = parse_robots_udf(self.user_agent)
        parsed = (
            unknown.join(self.raw, "host", "left")
            .select("host", parse(F.col("body")).alias("_p"))
            .select(
                "host",
                F.lit(rnd).cast("int").alias("fetched_round"),
                F.col("_p.crawl_delay_ms").cast("long").alias("crawl_delay_ms"),
                F.col("_p.rules").alias("rules"),
            )
        ).persist()
        n_new = parsed.count()
        if n_new == 0:
            parsed.unpersist()
            return 0
        if n_new > self.local_append_max:
            # big discovery burst: write from the executors, never funnel
            # the rows through the driver
            self.cat.append("robots", parsed)
            parsed.unpersist()
            return n_new
        new_rows = parsed.collect()
        parsed.unpersist()
        import pyarrow as pa

        table = pa.Table.from_pylist(
            [
                {
                    "host": r["host"], "fetched_round": r["fetched_round"],
                    "crawl_delay_ms": r["crawl_delay_ms"],
                    "rules": [{"allow": x["allow"], "prefix": x["prefix"]}
                              for x in (r["rules"] or [])],
                }
                for r in new_rows
            ],
            schema=_robots_arrow_schema(),
        )
        self.cat.append_local("robots", table)
        return len(new_rows)

    def rules_df(self) -> DataFrame:
        """Current (host, sorted rules) — re-read per round so mid-crawl
        discoveries are visible; the parse already sorts longest-first,
        ``sorted_rules`` keeps that order (stable) for any writer."""
        return self.cat.read("robots").select(
            "host", sorted_rules(F.col("rules")).alias("rules")
        )

    def gate(self):
        return make_gate(self.rules_df())

    def crawl_delays(self) -> DataFrame:
        return self.cat.read("robots").select(
            "host", F.col("crawl_delay_ms").cast("long").alias("crawl_delay_ms")
        )


def load_raw(spark: SparkSession, web_dir: str) -> DataFrame:
    """The raw robots.txt bodies table (host, body) — the discover
    mode's network stand-in."""
    import os

    path = f"{web_dir}/robots_raw.parquet"
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} missing: robots_mode='discover' needs raw robots "
            "bodies (regenerate the fixture; older cached fixtures only "
            "carry the pre-parsed robots_txt table)"
        )
    return spark.read.parquet(path).select("host", "body")


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
