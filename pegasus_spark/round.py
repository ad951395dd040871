"""One crawl round as ONE DataFrame dataflow (SURVEY.md §3.1).

shriphani/pegasus wires its stages as core.async channels (visited/robots
filters → fetch → extract → write → enqueue; ``src/pegasus/core.clj``
crawl — symbol cite per SURVEY.md §0). Here the whole stage list folds
into a single Catalyst plan per round; channels' pipelining/backpressure
becomes whole-stage codegen + bounded rounds (SURVEY.md §2 O16).

Physical design notes (the 100 TB story):
- exactly two data-sized shuffles per round: the per-host politeness
  window and the enqueue dedup aggregation; the robots gate is a
  broadcast-side pandas UDF, the seen check is bloom-prefiltered,
  the fetch/decode re-shuffle is on the *salted* host_bucket;
- the frontier is append-only (no rewrite churn): "pending" is
  recomputed as frontier ⟕̸ corpus (anti-join on url_hash) — on Iceberg
  both sides are bucketed by url_hash so this is a co-partitioned join;
- metrics are appended per round with a per-bucket breakdown
  (per-partition lineage + metrics per the north rule).
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from . import politeness
from .canon import resolve_canonicalize
from .config import CrawlConfig
from .fetch import fetch_and_validate
from .seen import SeenSet
from .tables import ManifestCatalog

FRONTIER_DDL = (
    "url string, url_hash long, host string, priority int, "
    "discovered_round int, src_url_hash long"
)
CORPUS_DDL = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, "
    "phash long, url string, url_hash long, host string, fetch_round int, "
    "fetch_vt long, valid boolean, psnr double"
)
HOSTS_DDL = "host string, next_vt long"
METRICS_DDL = (
    "round int, part_id int, fetched long, enqueued long, dropped_seen long, "
    "dropped_robots long, deferred long, wall_ms long"
)
METRICS_ARROW = pa.schema([
    ("round", pa.int32()), ("part_id", pa.int32()), ("fetched", pa.int64()),
    ("enqueued", pa.int64()), ("dropped_seen", pa.int64()),
    ("dropped_robots", pa.int64()), ("deferred", pa.int64()), ("wall_ms", pa.int64()),
])


def _metrics_table(rows: list[tuple]) -> pa.Table:
    cols = list(zip(*rows)) if rows else [[] for _ in METRICS_ARROW.names]
    return pa.Table.from_arrays(
        [pa.array(list(c), type=f.type) for c, f in zip(cols, METRICS_ARROW)],
        schema=METRICS_ARROW,
    )


from pyspark.sql.types import StringType


@F.pandas_udf(StringType())
def _canon_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    return resolve_canonicalize(base, href)


# canon is pure, but asNondeterministic() stops Catalyst from (a) pushing
# the `url IS NOT NULL` filter below the repartition exchange — which
# re-evaluated the UDF on the UN-repartitioned input, single-task for a
# one-file seed list (measured: a second full canon pass, 30s at 150k
# seeds) — and (b) collapsing it into multiple projections (double
# evaluation for the filter + the column).
_canon_udf = _canon_udf.asNondeterministic()


def canonicalize_links(df: DataFrame, base_col: str = "base_url", href_col: str = "href") -> DataFrame:
    """href resolved+canonicalized → ``url``, hashed JVM-side → ``url_hash``,
    ``host`` extracted JVM-side. Non-crawlable hrefs dropped."""
    return (
        df.withColumn("url", _canon_udf(F.col(base_col), F.col(href_col)))
        .filter(F.col("url").isNotNull())
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("host", F.parse_url("url", F.lit("HOST")))
    )


def dedupe_candidates(links: DataFrame) -> DataFrame:
    """Within-batch dedup (O10): one row per url_hash; the winning parent
    is min (parent_priority, src_url_hash) — deterministic lineage."""
    return (
        links.groupBy("url_hash")
        .agg(
            F.min("url").alias("url"),
            F.min("host").alias("host"),
            F.min(F.struct("parent_priority", "src_url_hash")).alias("_p"),
        )
        .select(
            "url_hash", "url", "host",
            (F.col("_p.parent_priority") + F.lit(1)).cast("int").alias("priority"),
            F.col("_p.src_url_hash").alias("src_url_hash"),
        )
    )


class RoundContext:
    """Per-crawl helpers shared across rounds. ``gate``/``crawl_delays``
    are refreshed per round when robots are discovered mid-crawl
    (``robots`` is a RobotsCache in discover mode, None in preparsed).
    ``gate(df, url_col)`` adds ``allowed:boolean`` via a host-join against
    the rules table (robots.make_gate — no driver-side rules structure)."""

    def __init__(self, spark: SparkSession, cat: ManifestCatalog, seen: SeenSet,
                 cfg: CrawlConfig, pages: DataFrame, gate, crawl_delays: DataFrame,
                 robots=None):
        self.spark = spark
        self.cat = cat
        self.seen = seen
        self.cfg = cfg
        self.pages = pages
        self.gate = gate
        self.crawl_delays = crawl_delays
        self.robots = robots


def enqueue_new(ctx: RoundContext, cand: DataFrame, discovered_round: int) -> tuple[int, int, int]:
    """Robots-gate, seen-gate, append to frontier+seen.
    Returns (n_enqueued, dropped_robots, dropped_seen)."""
    et = _StepTimer(f"enq{discovered_round}")
    if ctx.robots is not None:
        # discover mode: robots-fetch sub-batch for hosts first seen in
        # this candidate set (pegasus fetches robots.txt the first time a
        # host is touched). Every frontier row passes through here, so
        # the schedule stage downstream never sees an unknown host.
        cand = cand.persist()
        ctx.robots.ensure(cand.select("host"), discovered_round)
        ctx.gate = ctx.robots.gate()
        ctx.crawl_delays = ctx.robots.crawl_delays()
    # every count rides the single frontier-append job via observe() —
    # filter_new is single-branch by design (see SeenSet.filter_new), so
    # each observed node appears exactly once in the plan
    obs_f = Observation()
    flagged = ctx.gate(cand).observe(
        obs_f,
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("allowed").cast("long")).alias("n_allowed"),
    )
    obs_n = Observation()
    new = (
        ctx.seen.filter_new(flagged.filter("allowed").drop("allowed"))
        .observe(obs_n, F.count(F.lit(1)).alias("n_new"))
        .persist()
    )
    rows = new.select(
        "url", "url_hash", "host", "priority",
        F.lit(discovered_round).cast("int").alias("discovered_round"),
        "src_url_hash",
    )
    # frontier append and bloom merge are independent consumers of the
    # persisted `new` (different tables, txn-staged commits): run them as
    # concurrent jobs. seen.add is now unconditional — the n_new>0 gate
    # required the append's observation first, re-serializing the chain;
    # an empty merge is a tiny pass-through cogroup of P bloom rows.
    from concurrent.futures import ThreadPoolExecutor

    enq_workers = 1 if os.environ.get("PEGASUS_ROUND_SERIAL") == "1" else 2
    with ThreadPoolExecutor(max_workers=enq_workers) as pool:
        f_app = pool.submit(ctx.cat.append, "frontier", rows)
        f_seen = pool.submit(ctx.seen.add, new.select("url_hash"))
        f_app.result()
        f_seen.result()
    et.lap("frontier_append|seen_add")
    cf = _obs_get(obs_f, lambda: ctx.gate(cand).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("allowed").cast("long")).alias("n_allowed")).collect()[0])
    n_uniq, n_allowed = int(cf["n"]), int(cf["n_allowed"] or 0)
    n_new = int(_obs_get(obs_n, lambda: {"n_new": new.count()})["n_new"])
    et.lap("obs_counts")
    new.unpersist()
    if ctx.robots is not None:
        cand.unpersist()
    return n_new, n_uniq - n_allowed, n_allowed - n_new


def inject_seeds(ctx: RoundContext, seeds: DataFrame) -> tuple[int, int, int]:
    """O1: canonicalize seed URLs and enqueue at depth 0, round 0."""
    links = seeds.select(
        F.col("url").alias("base_url"),
        F.col("url").alias("href"),
        (F.col("priority") - F.lit(1)).alias("parent_priority"),  # so +1 = seed priority
        F.lit(None).cast("long").alias("src_url_hash"),
    # seed lists often arrive as ONE file/row group → without this the
    # canonicalize stage runs single-task (a 10^5-seed inject measured
    # 31 s in one task vs ~2 s spread over the cores)
    ).repartition(ctx.spark.sparkContext.defaultParallelism)
    cand = dedupe_candidates(canonicalize_links(links))
    return enqueue_new(ctx, cand, discovered_round=0)


def _obs_get(obs: Observation, fallback):
    """Observation.get, tolerant of AQE empty-relation propagation: when a
    round's plan collapses to an empty LocalRelation, the CollectMetrics
    node is optimized away and `get` raises — fall back to a (trivially
    cheap, because empty) aggregate job."""
    try:
        return obs.get
    except Exception:
        return fallback()


_TIMING = os.environ.get("PEGASUS_DEBUG_TIMING") == "1"


class _StepTimer:
    """Per-stage wall clock. Laps are always collected (a handful of
    monotonic() calls per round) and returned in the round stats, so the
    bench can report a data-phase vs coordination split; printing stays
    behind PEGASUS_DEBUG_TIMING."""

    def __init__(self, rnd: int):
        self.rnd = rnd
        self.t = time.monotonic()
        self.laps: dict[str, float] = {}

    def lap(self, label: str) -> None:
        now = time.monotonic()
        self.laps[label] = self.laps.get(label, 0.0) + (now - self.t)
        if _TIMING:
            print(f"    [r{self.rnd}] {label}: {now - self.t:.2f}s", flush=True)
        self.t = now


def run_round(ctx: RoundContext, r: int, visited_total: int) -> dict:
    """Execute crawl round r (one multi-table transaction — all the
    round's commits publish together). Returns the round's stats dict."""
    with ctx.cat.txn():
        return _run_round_inner(ctx, r, visited_total)


def _run_round_inner(ctx: RoundContext, r: int, visited_total: int) -> dict:
    t_start = time.monotonic()
    st_t = _StepTimer(r)
    cfg = ctx.cfg
    W = cfg.round_width
    round_start, round_end = r * W, (r + 1) * W

    if ctx.robots is not None:
        # re-bind to the robots table's current version (fresh ctx after
        # resume; rows appended by earlier rounds' sub-batches)
        ctx.crawl_delays = ctx.robots.crawl_delays()
        ctx.gate = ctx.robots.gate()

    frontier = ctx.cat.read("frontier")
    fetched_hashes = ctx.cat.read("corpus").select("url_hash")
    # no broadcast hint on the delays side: Catalyst auto-broadcasts while
    # the robots table is under the threshold and shuffle-joins past it
    # (10^8 hosts) — same policy as the rules gate
    pending = frontier.join(fetched_hashes, "url_hash", "left_anti").join(
        ctx.crawl_delays, "host", "left"
    )
    host_state = ctx.cat.read("hosts")

    sched = politeness.schedule(
        pending, host_state, round_start, round_end, cfg.min_delay_ms
    )
    obs_s = None
    if cfg.corpus_size is not None:
        # truncation needs the selected count BEFORE the fetch runs →
        # one dedicated count job on this path only
        sched = sched.persist()
        cnt = sched.agg(
            F.count("*").alias("n"),
            F.sum(F.col("selected").cast("long")).alias("n_sel"),
        ).collect()[0]
        n_pending, n_sel = int(cnt["n"]), int(cnt["n_sel"] or 0)
    else:
        # unbounded crawl: the counts ride the corpus-append job
        obs_s = Observation()
        sched = sched.observe(
            obs_s,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("selected").cast("long")).alias("n_sel"),
        ).persist()
        n_pending = n_sel = -1  # resolved after the append
    st_t.lap("schedule+counts")
    if n_pending == 0:
        sched.unpersist()
        wall_ms = int((time.monotonic() - t_start) * 1000)
        ctx.cat.append_local("metrics", _metrics_table([(r, -1, 0, 0, 0, 0, 0, wall_ms)]))
        return {"round": r, "fetched": 0, "enqueued": 0, "dropped_seen": 0,
                "dropped_robots": 0, "deferred": 0, "exhausted": True,
                "capped": False, "wall_ms": wall_ms}

    selected = sched.filter("selected")
    capped = False
    if cfg.corpus_size is not None and visited_total + n_sel > cfg.corpus_size:
        remaining = cfg.corpus_size - visited_total
        # deterministic final-round truncation in global fetch order (O13)
        selected = selected.orderBy("fetch_vt", "url_hash").limit(remaining)
        n_sel = remaining
        capped = True

    # --- fetch + validate (salted by host_bucket) ---
    # NOT persisted: its only consumer is the corpus append. Extraction
    # reads out_links straight from the page store (below) — persisting
    # payload-bearing rows would re-materialize GBs per round for a stage
    # that needs one tiny column.
    fetched = fetch_and_validate(
        selected, ctx.pages, cfg.host_buckets, cfg.validate_payloads,
        selection_count=n_sel if n_sel >= 0 else None,
        broadcast_max=cfg.fetch_broadcast_max,
        has_lossy=getattr(ctx, "has_lossy", None),
    )

    # per-bucket lineage counts ride the corpus write via observe():
    # no extra job for the per-partition metrics breakdown
    obs = Observation(f"round-{r}")
    bucket_aggs = [
        F.sum(F.when(F.col("host_bucket") == i, 1).otherwise(0)).alias(f"b{i}")
        for i in range(cfg.host_buckets)
    ]
    corpus_rows = fetched.observe(obs, *bucket_aggs).select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        "url", "url_hash", "host",
        F.lit(r).cast("int").alias("fetch_round"),
        "fetch_vt", "valid", "psnr",
    )
    if cfg.writer is not None:
        # pegasus's :writer plug point (default-writer-fn override): the
        # user stage transforms corpus rows before the append (e.g. a
        # thumbnail-only corpus rewrites `bytes`). Contract: keep the
        # corpus schema and row set — url_hash rows drive the visited
        # bookkeeping (pending = frontier ⟕̸ corpus), so filtering rows
        # here would cause refetches
        corpus_rows = cfg.writer.apply(corpus_rows)

    def _do_corpus():
        ctx.cat.append("corpus", corpus_rows, options=cfg.corpus_write_options)
        return _obs_get(obs, lambda: {f"b{i}": 0 for i in range(cfg.host_buckets)})

    def _do_enqueue():
        if capped:  # pegasus stops consuming docs once corpus-size trips
            return 0, 0, 0
        # link extraction never depends on decode output: join the
        # selection against ONLY the page store's out_links column
        # (columnar pruning — the payload bytes are not re-read). Inner
        # join ≡ fetched pages; 404 rows have no links by construction.
        sel_keys = selected.select("url", "url_hash", "priority")
        if cfg.fetch_broadcast_max > 0 and (n_sel < 0 or n_sel <= cfg.fetch_broadcast_max):
            sel_keys = F.broadcast(sel_keys)
        page_links = ctx.pages
        if cfg.extract_fmts is not None:
            # content-type gate (pegasus drops non-HTML before extraction):
            # non-crawlable payloads stay fetched/visited, yield no links
            page_links = page_links.filter(F.col("fmt").isin(list(cfg.extract_fmts)))
        links = (
            page_links.select("url_hash", "out_links")
            .join(sel_keys, "url_hash", "inner")
            .filter(F.col("out_links").isNotNull())
            .select(
                F.col("url").alias("base_url"),
                F.col("priority").alias("parent_priority"),
                F.col("url_hash").alias("src_url_hash"),
                F.explode("out_links").alias("href"),
            )
        )
        if cfg.extractor is not None:
            links = cfg.extractor.apply(links)
        cand = dedupe_candidates(canonicalize_links(links))
        if cfg.pre_enqueue is not None:
            cand = cfg.pre_enqueue.apply(cand)
        return enqueue_new(ctx, cand, discovered_round=r + 1)

    def _do_hosts():
        new_hosts = politeness.next_host_state(selected, host_state)
        ctx.cat.overwrite("hosts", new_hosts)

    # --- the corpus append, the extract/enqueue chain and the host-clock
    # update are pairwise INDEPENDENT (all consume the persisted `sched`;
    # they write different tables and the txn serializes only the final
    # CURRENT swaps): submit all three as concurrent Spark jobs. The
    # driver's serial commit/scheduling path was the measured scaling
    # bottleneck at small round sizes (BENCH/scaling_crawl.json r2) —
    # concurrency collapses three job-latency chains into max() of them.
    # PEGASUS_ROUND_SERIAL=1 degrades to sequential submission (A/B knob
    # for the scaling harness; semantics identical either way).
    from concurrent.futures import ThreadPoolExecutor

    n_workers = 1 if os.environ.get("PEGASUS_ROUND_SERIAL") == "1" else 3
    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        f_corpus = pool.submit(_do_corpus)
        f_enq = pool.submit(_do_enqueue)
        f_hosts = pool.submit(_do_hosts)
        bucket_counts = f_corpus.result()
        n_enq, dropped_robots, dropped_seen = f_enq.result()
        f_hosts.result()
    if obs_s is not None:
        cs = _obs_get(obs_s, lambda: sched.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("selected").cast("long")).alias("n_sel")).collect()[0])
        n_pending, n_sel = int(cs["n"]), int(cs["n_sel"] or 0)
        if n_pending == 0:
            # exhausted, discovered only after the (empty) writes ran —
            # the concurrent branches did no data work, their empty
            # commits publish with the txn and are harmless
            sched.unpersist()
            wall_ms = int((time.monotonic() - t_start) * 1000)
            ctx.cat.append_local("metrics", _metrics_table([(r, -1, 0, 0, 0, 0, 0, wall_ms)]))
            return {"round": r, "fetched": 0, "enqueued": 0, "dropped_seen": 0,
                    "dropped_robots": 0, "deferred": 0, "exhausted": True,
                    "capped": False, "wall_ms": wall_ms}
    st_t.lap("corpus_append | extract+enqueue | hosts (concurrent)")

    # --- metrics: rollup row + per-bucket lineage rows ---
    wall_ms = int((time.monotonic() - t_start) * 1000)
    mrows = [(r, -1, n_sel, n_enq, dropped_seen, dropped_robots,
              n_pending - n_sel, wall_ms)] + [
        (r, i, int(bucket_counts[f"b{i}"] or 0), 0, 0, 0, 0, 0)
        for i in range(cfg.host_buckets)
        if int(bucket_counts[f"b{i}"] or 0) > 0
    ]
    ctx.cat.append_local("metrics", _metrics_table(mrows))

    sched.unpersist()
    return {"round": r, "fetched": n_sel, "enqueued": n_enq,
            "dropped_seen": dropped_seen, "dropped_robots": dropped_robots,
            "deferred": n_pending - n_sel, "exhausted": False,
            "capped": capped, "wall_ms": wall_ms,
            "laps": {k: round(v, 3) for k, v in st_t.laps.items()}}
