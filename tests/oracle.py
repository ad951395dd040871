"""Pure-Python pegasus-semantics simulator (SURVEY.md §5.2).

Single-threaded reimplementation of the crawl specification — per-host
FIFO with virtual-time min-delay pacing, robots gate, enqueued-ever seen
set, corpus-size / frontier-exhaustion stop — producing golden outputs
(fetch order, visited set, per-round metrics) that the Spark engine must
reproduce exactly. This is how the reference's "same crawl ordering and
final visited-set" criterion (BASELINE.json north_rule; pegasus's
corpus-size/num-visited crawl tests) is made testable at all: the
deterministic virtual-time politeness model is the spec BOTH
implementations follow (pegasus's own wall-clock thread interleaving is
not reproducible even by pegasus).

No Spark imports. Shares only the canonicalization + robots-match +
hash primitives with the engine so both sides agree on *string-level*
semantics while implementing the *scheduling* independently.
"""

from __future__ import annotations

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from collections import defaultdict
from dataclasses import dataclass, field

import pandas as pd

from pegasus_spark.canon import canonicalize_one, host_of
from pegasus_spark.hashing import xxhash64_str
from pegasus_spark.robots import allowed_one


def _path_of(url: str) -> str:
    rest = url.split("://", 1)[1]
    i = rest.find("/")
    return rest[i:] if i >= 0 else "/"


@dataclass
class SimResult:
    order: list = field(default_factory=list)  # (seq, round, url_hash, fetch_vt)
    visited: set = field(default_factory=set)  # url_hashes with a corpus row
    extra_visited: set = field(default_factory=set)  # redirect-chain members
    status: dict = field(default_factory=dict)  # url_hash -> fetch_status
    final_url: dict = field(default_factory=dict)  # url_hash -> followed target
    seen: set = field(default_factory=set)     # ever-enqueued url_hashes
    metrics: list = field(default_factory=list)
    rounds: int = 0
    stop_reason: str = "max_rounds"
    # scenario-composition counters (not compared against the engine —
    # used by tests to assert a fixture actually exercised a behavior)
    flaky_redirects: int = 0


def simulate(
    web: dict[str, pd.DataFrame],
    min_delay_ms: int = 2000,
    round_width: int | None = None,
    corpus_size: int | None = None,
    max_rounds: int = 10_000,
    seeds: list[str] | None = None,
    extract_fmts: tuple | None = None,
    max_redirect_hops: int = 4,
    max_fetch_attempts: int = 3,
) -> SimResult:
    W = round_width or 8 * min_delay_ms
    pages = web["pages"]
    by_hash = {
        int(r.url_hash): r for r in pages.itertuples(index=False)
    }

    def _redirect_of(page):
        rt = getattr(page, "redirect_to", None)
        return None if rt is None or pd.isna(rt) else str(rt)

    def _flaky_until(page):
        fl = getattr(page, "flaky_until_round", 0)
        return 0 if fl is None or pd.isna(fl) else int(fl)

    def resolve_chain(src_url: str, src_hash: int, first_target: str):
        """Mirror fetch.resolve_redirects hop-for-hop: chain = every hash
        touched; status redirect|redirect_dangling|redirect_loop|
        redirect_cap; (final_hash, final_url) = last chain state. An
        uncanonicalizable Location (canon → None) terminates the chain as
        redirect_dangling with NULL final state — the junk target is
        never hashed or visited (same contract as the engine)."""
        chain = [src_hash]
        cur_url = canonicalize_one(src_url, first_target)
        for _hop in range(max_redirect_hops):
            if cur_url is None:
                return "redirect_dangling", None, None, chain
            cur_hash = xxhash64_str(cur_url)
            if cur_hash in chain:
                return "redirect_loop", cur_hash, cur_url, chain
            tgt = by_hash.get(cur_hash)
            if tgt is None:
                chain.append(cur_hash)
                return "redirect_dangling", cur_hash, cur_url, chain
            if _redirect_of(tgt) is None:
                chain.append(cur_hash)
                return "redirect", cur_hash, cur_url, chain
            chain.append(cur_hash)
            cur_url = canonicalize_one(cur_url, _redirect_of(tgt))
        if cur_url is None:
            return "redirect_dangling", None, None, chain
        return "redirect_cap", xxhash64_str(cur_url), cur_url, chain
    rules: dict[str, list[tuple[bool, str]]] = {}
    delays: dict[str, int] = {}
    for r in web["robots_txt"].itertuples(index=False):
        rs = [(x["allow"], x["prefix"]) for x in (r.rules or [])]
        rs.sort(key=lambda t: len(t[1]), reverse=True)
        rules[r.host] = rs
        if r.crawl_delay_ms is not None and not pd.isna(r.crawl_delay_ms):
            delays[r.host] = int(r.crawl_delay_ms)

    def eff_delay(host: str) -> int:
        return max(min_delay_ms, delays.get(host, 0))

    res = SimResult()
    # frontier: url_hash → (priority, discovered_round, host, url)
    frontier: dict[int, tuple[int, int, str, str]] = {}
    host_next_vt: dict[str, int] = defaultdict(int)

    def enqueue_batch(cands: list[tuple[str, int, int | None]], disc_round: int) -> tuple[int, int, int]:
        """cands = [(canonical_url, parent_priority, src_hash)]; returns
        (enqueued, dropped_robots, dropped_seen). Mirrors round.py
        dedupe_candidates + enqueue_new exactly."""
        best: dict[int, tuple[int, int | None, str]] = {}
        for curl, pprio, src in cands:
            h = xxhash64_str(curl)
            key = (pprio, src if src is not None else -(1 << 63))
            if h not in best or key < (best[h][0], best[h][1] if best[h][1] is not None else -(1 << 63)):
                best[h] = (pprio, src, curl)
        n_uniq = len(best)
        allowed = {}
        for h, (pprio, src, curl) in best.items():
            host = curl.split("://", 1)[1].split("/", 1)[0].split(":")[0]
            if allowed_one(rules, host, _path_of(curl)):
                allowed[h] = (pprio, src, curl, host)
        dropped_robots = n_uniq - len(allowed)
        new = {h: v for h, v in allowed.items() if h not in res.seen}
        dropped_seen = len(allowed) - len(new)
        for h, (pprio, src, curl, host) in new.items():
            frontier[h] = (pprio + 1, disc_round, host, curl)
            res.seen.add(h)
        return len(new), dropped_robots, dropped_seen

    # --- seed injection (O1): parent_priority = seed_priority - 1 ---
    if seeds is None:
        seed_rows = [(r.url, int(r.priority)) for r in web["seeds"].itertuples(index=False)]
    else:
        seed_rows = [(u, 0) for u in seeds]
    seed_cands = []
    for url, prio in seed_rows:
        c = canonicalize_one(url, url)
        if c is not None:
            seed_cands.append((c, prio - 1, None))
    enqueue_batch(seed_cands, disc_round=0)

    # --- rounds ---
    seq = 0
    attempts: dict[int, int] = defaultdict(int)
    for r in range(max_rounds):
        res.rounds = r + 1
        round_start, round_end = r * W, (r + 1) * W
        pendings = [h for h in frontier
                    if h not in res.visited and h not in res.extra_visited]
        if not pendings:
            res.rounds = r + 1
            res.stop_reason = "exhausted"
            res.metrics.append({"round": r, "fetched": 0, "enqueued": 0,
                                "dropped_seen": 0, "dropped_robots": 0,
                                "deferred": 0, "retried": 0})
            return res

        by_host: dict[str, list[int]] = defaultdict(list)
        for h in pendings:
            by_host[frontier[h][2]].append(h)

        selected: list[tuple[int, int]] = []  # (fetch_vt, url_hash)
        for host, hs in by_host.items():
            hs.sort(key=lambda x: (frontier[x][0], frontier[x][1], x))
            d = eff_delay(host)
            t0 = max(round_start, host_next_vt[host])
            for i, h in enumerate(hs):
                vt = t0 + i * d
                if vt < round_end:
                    selected.append((vt, h))
                else:
                    break
        selected.sort()
        n_pending = len(pendings)
        capped = False
        if corpus_size is not None and len(res.visited) + len(selected) > corpus_size:
            selected = selected[: corpus_size - len(res.visited)]
            capped = True

        # advance host clocks from the (possibly truncated) selection
        last_per_host: dict[str, int] = {}
        for vt, h in selected:
            last_per_host[frontier[h][2]] = vt
        for host, vt in last_per_host.items():
            host_next_vt[host] = max(host_next_vt[host], vt + eff_delay(host))

        # snapshot BEFORE this round's fetches: the engine's redirects
        # append dedups against round-start table versions
        prev_visited = set(res.visited) | set(res.extra_visited)

        link_cands: list[tuple[str, int, int]] = []
        n_retried = 0
        for vt, h in selected:
            page = by_hash.get(h)
            # chains resolve FIRST (3xx responses are always served);
            # the transient-failure gate then applies to the CONTENT
            # page — the final target of a followed chain, the page
            # itself otherwise (mirrors fetch.split_flaky)
            st = fhash = furl = chain = None
            if page is not None and _redirect_of(page) is not None:
                st, fhash, furl, chain = resolve_chain(
                    frontier[h][3], h, _redirect_of(page))
            content = None
            if page is not None:
                content = page if st is None else (
                    by_hash.get(fhash) if st == "redirect" else None)
            # transient failure (503-until analogue): consumes the slot,
            # writes no corpus row, stays pending — unless out of
            # attempts. A retried/exhausted redirect source's chain
            # members do NOT enter the visited set (the retry re-walks
            # the chain; on exhaustion the content was never retrieved).
            if content is not None and r < _flaky_until(content):
                if st == "redirect":
                    res.flaky_redirects += 1
                attempts[h] += 1
                if attempts[h] < max_fetch_attempts:
                    n_retried += 1
                    continue
                res.order.append((seq, r, h, vt))
                seq += 1
                res.visited.add(h)
                res.status[h] = "transient_exhausted"
                continue
            res.order.append((seq, r, h, vt))
            seq += 1
            res.visited.add(h)
            if page is None:
                res.status[h] = "missing"
                continue
            if st is not None:
                res.status[h] = st
                if furl is not None:
                    res.final_url[h] = furl
                for m in chain[1:]:
                    if m not in prev_visited:
                        res.extra_visited.add(m)
                if st != "redirect":
                    continue  # chain never reached content: no links
                page = by_hash.get(fhash)
                base = furl
            else:
                res.status[h] = "ok"
                base = page.url
            if extract_fmts is not None and page.fmt not in extract_fmts:
                continue  # content-type gate: visited, but no links
            if not capped:
                prio = frontier[h][0]
                for href in page.out_links:
                    c = canonicalize_one(base, href)
                    if c is not None:
                        link_cands.append((c, prio, h))
        n_enq = dr = ds = 0
        if not capped and link_cands:
            n_enq, dr, ds = enqueue_batch(link_cands, disc_round=r + 1)
        res.metrics.append({
            "round": r, "fetched": len(selected) - n_retried, "enqueued": n_enq,
            "dropped_seen": ds, "dropped_robots": dr,
            "deferred": n_pending - len(selected), "retried": n_retried,
        })
        if corpus_size is not None and len(res.visited) >= corpus_size:
            res.stop_reason = "corpus_size"
            return res
        if (not capped and n_pending - len(selected) == 0
                and n_retried == 0 and n_enq == 0):
            # early exhaustion (mirrors round.frontier_exhausts_after):
            # nothing deferred, nothing retrying, nothing enqueued — the
            # next pending set is provably empty; stop without the empty
            # probe round (and without its all-zero metrics row)
            res.stop_reason = "exhausted"
            return res
    return res
