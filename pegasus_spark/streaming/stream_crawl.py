"""Continuous crawling as Structured Streaming (optional skin, SURVEY.md
§2 'streaming-only concepts' / §7.6).

shriphani/pegasus runs continuously: its core.async queue workers poll
forever and new URLs can be injected while the crawl runs. The batch
engine models that as a driver loop; this module recovers the
*continuous* shape with Structured Streaming: a directory of seed-batch
parquet files is an unbounded source, and ``foreachBatch`` folds each
arriving seed batch into the SAME durable crawl state (frontier / seen /
corpus tables + checkpoints), then drains the frontier with the ordinary
round function. Exactly-once-ish: the engine's own enqueue dedup makes
seed redelivery idempotent, and Spark's streaming checkpoint tracks
which seed files were consumed.

No watermarks/event-time needed: politeness windows are virtual-time
arithmetic, not stream-time windows (SURVEY.md §2 O3).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..config import CrawlConfig
from ..crawl import TABLES, _make_ctx
from ..round import frontier_exhausts_after, inject_seeds, run_round


def stream_crawl(
    spark: SparkSession,
    cfg: CrawlConfig,
    seeds_stream_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    rounds_per_batch: int | None = None,
):
    """Start a streaming crawl over arriving seed batches.

    Each micro-batch: canonicalize+dedupe+enqueue the new seeds, then run
    crawl rounds until the frontier is exhausted (or ``rounds_per_batch``
    is hit — backpressure knob). Returns the StreamingQuery.
    """
    ctx, ckpt = _make_ctx(spark, cfg)

    state = {"round": 0, "visited": 0}
    latest = ckpt.latest()
    if latest is not None:
        state["round"] = latest["round"] + 1
        state["visited"] = latest["visited"]
        # floor-safe frontier-size seed for the size-adaptive plan gates
        # (same as crawl.crawl on resume — see RoundContext)
        ctx.approx_frontier_rows = latest["visited"]

    def process_batch(batch_df, batch_id: int):
        inject_seeds(ctx, batch_df.select("url", "priority"))
        budget = rounds_per_batch or cfg.max_rounds
        for _ in range(budget):
            r = state["round"]
            st = run_round(ctx, r, state["visited"])
            state["visited"] += st["fetched"]
            state["round"] += 1
            ckpt.save(r, {
                "versions": ctx.cat.snapshot(TABLES),
                "visited": state["visited"],
                "stopped": False, "reason": None,
                "stats": {k: v for k, v in st.items() if k != "round"},
            })
            if st["exhausted"] or frontier_exhausts_after(st):
                # the second arm stops without paying the empty probe
                # round (same rule as crawl.crawl); a later seed batch
                # simply continues from this round number
                break

    stream = (
        spark.readStream.schema("url string, priority int")
        .parquet(seeds_stream_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
