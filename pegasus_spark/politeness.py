"""Per-host politeness as a deterministic virtual-time schedule (O2/O3).

shriphani/pegasus serializes fetches per host: a durable-queue worker
``take!``s the host's FIFO and sleeps ≥ min-delay between consecutive
fetches (``src/pegasus/queue.clj`` setup-queue-worker — symbol cite per
SURVEY.md §0). Wall-clock sleeps are not reproducible — even by the
reference — so our engine AND the parity oracle both implement the same
*virtual-time specification* (SURVEY.md §2 O3, §5.2):

- virtual clock in ms; round r covers [r·W, (r+1)·W) where W = round
  width; each host carries ``next_vt`` (earliest allowed next fetch).
- within a round a host's pending URLs are ranked FIFO-deterministic:
  (priority, discovered_round, url_hash); the i-th ranked URL gets
  ``fetch_vt = max(round_start, next_vt) + (i-1)·delay`` with
  ``delay = max(min_delay_ms, robots crawl_delay_ms)``;
- only URLs with ``fetch_vt < round_end`` are fetched this round; the
  rest are *deferred*, not dropped (they stay pending — frontier is
  append-only, selection is recomputed each round);
- after the round, ``next_vt(host) = last fetch_vt + delay``.

Global fetch order = (fetch_vt, url_hash) — a total order both sides
can compute. One shuffle: the per-host window (partitionBy host). This
is the politeness-correct shuffle; the *expensive* downstream stage
(fetch/decode) re-shuffles on salted ``host_bucket`` so one hot host
cannot pin a single task (SURVEY.md §4.2 item 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def schedule(
    pending: DataFrame,
    host_state: DataFrame,
    round_start: int,
    round_end: int,
    min_delay_ms: int,
) -> DataFrame:
    """Annotate pending URLs with (rn, delay_ms, fetch_vt, selected).

    ``pending`` must carry: url, url_hash, host, priority,
    discovered_round, crawl_delay_ms (nullable). ``host_state``:
    host, next_vt.
    """
    cand = pending.join(host_state, "host", "left").withColumn(
        "next_vt", F.coalesce(F.col("next_vt"), F.lit(0)).cast("long")
    )
    delay = F.greatest(
        F.lit(min_delay_ms).cast("long"),
        F.coalesce(F.col("crawl_delay_ms"), F.lit(0)).cast("long"),
    )
    w = Window.partitionBy("host").orderBy("priority", "discovered_round", "url_hash")
    cand = (
        cand.withColumn("delay_ms", delay)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("t0", F.greatest(F.lit(round_start).cast("long"), F.col("next_vt")))
        .withColumn(
            "fetch_vt",
            (F.col("t0") + (F.col("rn") - F.lit(1)).cast("long") * F.col("delay_ms")),
        )
        .withColumn("selected", F.col("fetch_vt") < F.lit(round_end))
        .drop("t0", "next_vt")
    )
    return cand


def next_host_state(selected: DataFrame, host_state: DataFrame) -> DataFrame:
    """New (host, next_vt): fetched hosts advance to last fetch_vt+delay;
    untouched hosts keep their clock."""
    advanced = selected.groupBy("host").agg(
        (F.max("fetch_vt") + F.max("delay_ms")).alias("next_vt_new")
    )
    merged = host_state.join(advanced, "host", "full").select(
        "host",
        F.greatest(
            F.coalesce(F.col("next_vt"), F.lit(0)),
            F.coalesce(F.col("next_vt_new"), F.lit(0)),
        ).alias("next_vt"),
    )
    return merged
