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
        if key == "disallow":
            if val:  # empty Disallow = allow everything → no rule
                cur_rules.append((False, val))
        elif key == "allow":
            if val:
                cur_rules.append((True, val))
        elif key == "crawl-delay":
            try:
                cur_delay = int(float(val) * 1000)
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

    The cache is a versioned ``robots`` table (checkpointed with the
    crawl, so resume sees the same rules) plus a driver-side dict twin —
    the dict is what the gate broadcasts, exactly like the preparsed
    mode, and it is O(hosts), not O(urls). ``ensure`` runs the
    robots-fetch sub-batch: unknown hosts ⟕ raw bodies (the sandbox
    network stand-in; a real deployment fetches ``host/robots.txt``
    here) → vectorized parse UDF → collect the NEW rows only (tiny) →
    local append, no Spark write job."""

    def __init__(self, spark: SparkSession, cat, raw_df: DataFrame, user_agent: str):
        self.spark = spark
        self.cat = cat
        self.raw = raw_df
        self.user_agent = user_agent
        cat.create("robots", ROBOTS_DDL)
        self._version = -1
        self._dict: dict[str, list[tuple[bool, str]]] = {}

    def _reload(self) -> None:
        v = self.cat.current_version("robots")
        if v == self._version:
            return
        rows = self.cat.read("robots").select("host", "rules").collect()
        self._dict = {
            r["host"]: sorted(
                [(x["allow"], x["prefix"]) for x in (r["rules"] or [])],
                key=lambda t: len(t[1]), reverse=True,
            )
            for r in rows
        }
        self._version = v

    def ensure(self, hosts_df: DataFrame, rnd: int) -> int:
        """Fetch+parse robots for hosts not yet cached. Returns how many
        new hosts were discovered."""
        self._reload()
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
        )
        new_rows = parsed.collect()
        if not new_rows:
            return 0
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
        self._reload()
        return len(new_rows)

    def allowed_udf(self):
        self._reload()
        return allowed_filter(self.spark, self._dict)

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
