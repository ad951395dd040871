"""Deterministic synthetic web generator (FIXTURES.md).

Stands in for HTTP in the sandbox (SURVEY.md §2 O6): the "web" is a
``pages`` table with image+caption payloads (BASELINE.json input_hint
schema exactly: image_id, bytes, w, h, fmt, caption, phash — plus crawl
plumbing columns url/url_hash/host/out_links and the oracle-side
``pixels_ref``). Pure function of its parameters; numpy
``default_rng(seed)`` with a fixed call order → bit-identical
regeneration (required by golden tests and checkpoint/resume parity).

Host distribution is Zipf(s) so hot-host skew is present in every
fixture — the reference's politeness bottleneck (one fetch per host per
min-delay; pegasus ``src/pegasus/queue.clj``, symbol cite per SURVEY.md
§0) and our skew-salting both get exercised.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from . import codec
from .hashing import xxhash64_str

_WORDS = (
    "amber basalt cedar delta ember fjord garnet harbor iris juniper "
    "kestrel lumen mesa nectar onyx prairie quartz raven sierra tundra"
).split()


@dataclass(frozen=True)
class WebParams:
    seed: int = 42
    n_pages: int = 1000
    n_hosts: int = 20
    fanout: float = 3.0
    zipf_s: float = 1.2
    lossy_frac: float = 0.5
    img_min: int = 8
    img_max: int = 32
    disallow_host_frac: float = 0.1
    crawl_delay_host_frac: float = 0.2
    n_seeds: int = 3
    # fraction of pages carrying an opaque non-image payload (fmt='bin',
    # undecodable bytes) — the content-type-gate scenario. Applied as a
    # post-pass with a SEPARATE rng so the main stream (and therefore
    # every existing fixture/golden trace) is byte-identical at 0.0.
    opaque_frac: float = 0.0
    # fraction of pages that are HTTP-3xx analogues: no payload, a
    # ``redirect_to`` URL instead (clj-http follows redirects inside
    # pegasus's fetcher — SURVEY.md §0 fetch semantics). A slice of the
    # redirect pages chain onto OTHER redirect pages (multi-hop), and one
    # deterministic 2-cycle loop is planted whenever ≥2 redirect pages
    # exist (the loop/cap test case). Separate post-pass rng, like
    # opaque_frac, so redirect_frac=0 fixtures are byte-identical.
    redirect_frac: float = 0.0
    # fraction of pages that fail transiently: fetch attempts in rounds
    # < ``flaky_until`` fail (a deterministic 503-until analogue); the
    # crawler must retry (bounded) and succeed once the page recovers.
    flaky_frac: float = 0.0
    flaky_until: int = 2
    # plant ONE redirect whose Location is a non-crawlable href
    # (non-hierarchical scheme → canonicalize → NULL): the
    # junk-Location → redirect_dangling contract (ADVICE r4 #5).
    # Applied inside the redirect post-pass, so =False fixtures stay
    # byte-identical.
    junk_redirect: bool = False
    extra: dict = field(default_factory=dict, compare=False)

    def tag(self) -> str:
        return (
            f"s{self.seed}_p{self.n_pages}_h{self.n_hosts}_f{self.fanout}"
            f"_z{self.zipf_s}_l{self.lossy_frac}_i{self.img_min}-{self.img_max}"
            f"_d{self.disallow_host_frac}_c{self.crawl_delay_host_frac}_sd{self.n_seeds}"
            + (f"_o{self.opaque_frac}" if self.opaque_frac else "")
            + (f"_r{self.redirect_frac}" if self.redirect_frac else "")
            + ("_jr" if self.junk_redirect else "")
            + (f"_fl{self.flaky_frac}-{self.flaky_until}" if self.flaky_frac else "")
        )


def _zipf_host_assignment(rng: np.random.Generator, n_pages: int, n_hosts: int, s: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n_hosts + 1, dtype=np.float64) ** s
    w /= w.sum()
    return rng.choice(n_hosts, size=n_pages, p=w)


def _make_pixels(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Structured (compressible) image: 2-D gradient + coarse noise."""
    gx = np.linspace(0, 255, w)
    gy = np.linspace(0, 255, h)
    base = (gy[:, None] * 0.5 + gx[None, :] * 0.5)
    img = np.empty((h, w, 3), dtype=np.float64)
    phase = rng.uniform(0, 2 * np.pi, size=3)
    amp = rng.uniform(20, 80, size=3)
    coarse = rng.integers(0, 40, size=(-(-h // 4), -(-w // 4), 3)).astype(np.float64)
    coarse = np.kron(coarse, np.ones((4, 4, 1)))[:h, :w, :]
    for c in range(3):
        img[:, :, c] = base * np.cos(phase[c]) ** 2 + amp[c] + coarse[:, :, c]
    return np.clip(img, 0, 255).astype(np.uint8)


def _caption(rng: np.random.Generator, image_id: str) -> str:
    k = int(rng.integers(4, 9))
    ws = rng.choice(len(_WORDS), size=k)
    return f"caption {image_id} :: " + " ".join(_WORDS[i] for i in ws)


def generate_web(p: WebParams) -> dict[str, pd.DataFrame]:
    """Build ``pages``, ``seeds``, ``robots_txt`` pandas DataFrames."""
    rng = np.random.default_rng(p.seed)
    hosts = [f"h{k}.example" for k in range(p.n_hosts)]
    host_idx = _zipf_host_assignment(rng, p.n_pages, p.n_hosts, p.zipf_s)
    urls = [f"http://{hosts[host_idx[i]]}/p/{i}" for i in range(p.n_pages)]
    url_hash = np.fromiter((xxhash64_str(u) for u in urls), dtype=np.int64)

    dims = rng.integers(p.img_min, p.img_max + 1, size=(p.n_pages, 2))
    lossy = rng.random(p.n_pages) < p.lossy_frac
    n_links = rng.poisson(p.fanout, size=p.n_pages)

    rows: dict[str, list] = {
        "bytes": [], "fmt": [], "caption": [], "phash": [],
        "out_links": [], "pixels_ref": [], "ref_md5": [],
    }
    for i in range(p.n_pages):
        w, h = int(dims[i, 0]), int(dims[i, 1])
        px = _make_pixels(rng, w, h)
        fmt = "qnt" if lossy[i] else "png"
        image_id = f"img-{int(url_hash[i]) & 0xFFFFFFFFFFFFFFFF:016x}"
        rows["bytes"].append(codec.encode(px, fmt))
        rows["fmt"].append(fmt)
        rows["caption"].append(_caption(rng, image_id))
        rows["phash"].append(codec.phash(px))
        rows["pixels_ref"].append(px.tobytes())
        rows["ref_md5"].append(hashlib.md5(px.tobytes()).hexdigest())
        # out-links in varied surface forms to exercise canonicalization
        targets = rng.integers(0, p.n_pages, size=n_links[i])
        forms = rng.integers(0, 6, size=n_links[i])
        links: list[str] = []
        for t, f in zip(targets, forms):
            t = int(t)
            th = hosts[host_idx[t]]
            same_host = host_idx[t] == host_idx[i]
            if f == 1:
                links.append(f"http://{th.upper()}/p/{t}")
            elif f == 2:
                links.append(f"http://{th}:80/p/{t}")
            elif f == 3:
                links.append(f"http://{th}/p/{t}#frag{t}")
            elif f == 4 and same_host:
                links.append(f"../p/{t}")
            elif f == 5 and same_host:
                links.append(f"/p/{t}")
            else:
                links.append(f"http://{th}/p/{t}")
        rows["out_links"].append(links)

    pages = pd.DataFrame({
        "url": urls,
        "url_hash": url_hash,
        "host": [hosts[k] for k in host_idx],
        "image_id": [f"img-{int(uh) & 0xFFFFFFFFFFFFFFFF:016x}" for uh in url_hash],
        "bytes": rows["bytes"],
        "w": dims[:, 0].astype(np.int32),
        "h": dims[:, 1].astype(np.int32),
        "fmt": rows["fmt"],
        "caption": rows["caption"],
        "phash": np.array(rows["phash"], dtype=np.int64),
        "out_links": rows["out_links"],
        "pixels_ref": rows["pixels_ref"],
        "ref_md5": rows["ref_md5"],
    })

    pages["redirect_to"] = pd.array([None] * p.n_pages, dtype="string")
    pages["flaky_until_round"] = np.zeros(p.n_pages, dtype=np.int32)

    if p.opaque_frac > 0:
        # post-pass with a dedicated rng: replaces payloads only; the main
        # rng stream above is untouched, so all opaque_frac=0 fixtures
        # (and their golden crawl traces) stay byte-identical
        rng_o = np.random.default_rng(p.seed + 0x0FA9)
        opaque = np.flatnonzero(rng_o.random(p.n_pages) < p.opaque_frac)
        for i in opaque:
            i = int(i)
            pages.at[i, "fmt"] = "bin"
            pages.at[i, "bytes"] = b"\x00OPQ" + hashlib.md5(urls[i].encode()).digest() * 4
            pages.at[i, "phash"] = 0
            pages.at[i, "pixels_ref"] = b""
            pages.at[i, "ref_md5"] = ""

    if p.redirect_frac > 0:
        # 3xx post-pass (dedicated rng): redirect pages lose their payload
        # and gain a target. ~1/3 of them chain onto another redirect page
        # (multi-hop); the first two form a planted 2-cycle loop.
        rng_r = np.random.default_rng(p.seed + 0x3F0D)
        ridx = [int(i) for i in np.flatnonzero(rng_r.random(p.n_pages) < p.redirect_frac)]
        rset = set(ridx)
        non_redirect = [i for i in range(p.n_pages) if i not in rset]
        for j, i in enumerate(ridx):
            if len(ridx) >= 2 and j < 2:
                target = ridx[1 - j]  # a <-> b loop
            elif len(ridx) > 2 and rng_r.random() < 0.34:
                target = ridx[int(rng_r.integers(2, len(ridx)))]  # chain hop
                if target == i:
                    target = non_redirect[int(rng_r.integers(0, len(non_redirect)))]
            else:
                target = non_redirect[int(rng_r.integers(0, len(non_redirect)))]
            pages.at[i, "redirect_to"] = urls[target]
            pages.at[i, "bytes"] = None
            pages.at[i, "fmt"] = "3xx"
            pages.at[i, "caption"] = None
            pages.at[i, "phash"] = 0
            pages.at[i, "out_links"] = []  # a 3xx response body carries no links
            pages.at[i, "pixels_ref"] = b""
            pages.at[i, "ref_md5"] = ""
        if p.junk_redirect and ridx:
            # a Location a crawler cannot follow (non-hierarchical
            # scheme): canonicalize → NULL → redirect_dangling with no
            # final_hash/final_url, junk target never hashed or visited
            pages.at[ridx[-1], "redirect_to"] = "mailto:junk@invalid"

    if p.flaky_frac > 0:
        # transient-failure post-pass (dedicated rng): fetches before
        # round ``flaky_until`` fail; redirect pages are left reliable so
        # the two behaviors compose predictably in parity scenarios
        rng_f = np.random.default_rng(p.seed + 0x5034)
        flaky = np.flatnonzero(rng_f.random(p.n_pages) < p.flaky_frac)
        for i in flaky:
            i = int(i)
            if pages.at[i, "redirect_to"] is None or pd.isna(pages.at[i, "redirect_to"]):
                pages.at[i, "flaky_until_round"] = np.int32(p.flaky_until)

    # robots: deterministic per-host rules
    r_crawl_delay: list = []
    r_rules: list = []
    deny_all_host = 0 if p.n_hosts > 3 else -1  # h0 never (it's the hot host) …
    deny_all_host = p.n_hosts - 1 if p.n_hosts > 3 else -1  # … use the coldest
    for k in range(p.n_hosts):
        rules = [{"allow": True, "prefix": "/"}]
        if k == deny_all_host:
            rules = [{"allow": False, "prefix": "/"}]
        elif rng.random() < p.disallow_host_frac:
            digit = int(rng.integers(0, 10))
            rules.append({"allow": False, "prefix": f"/p/{digit}"})
        delay = None
        if rng.random() < p.crawl_delay_host_frac:
            delay = int(rng.integers(2, 5)) * 1000
        r_crawl_delay.append(delay)
        r_rules.append(rules)
    robots = pd.DataFrame({
        "host": hosts,
        "crawl_delay_ms": pd.array(r_crawl_delay, dtype="Int64"),
        "rules": r_rules,
    })

    # seeds: non-canonical surface forms of real pages, spread across hosts
    seed_pages = rng.choice(p.n_pages, size=min(p.n_seeds, p.n_pages), replace=False)
    seed_urls = []
    for j, t in enumerate(seed_pages):
        t = int(t)
        th = hosts[host_idx[t]]
        if j % 3 == 1:
            seed_urls.append(f"http://{th.upper()}:80/p/{t}#top")
        elif j % 3 == 2:
            seed_urls.append(f"http://{th}/p/../p/{t}")
        else:
            seed_urls.append(f"http://{th}/p/{t}")
    seeds = pd.DataFrame({"url": seed_urls, "priority": np.zeros(len(seed_urls), dtype=np.int32)})

    # robots_raw: the same rules rendered as raw robots.txt bodies — the
    # network stand-in for the discover mode's robots-fetch sub-batch.
    # Host k≡1 (mod 3) exercises user-agent group selection: the true
    # rules live under our product token, a deny-all group under '*' —
    # a parser that ignores UA specificity denies the whole host and
    # breaks crawl parity. Every body also carries a decoy 'evilbot'
    # deny-all group; host k≡2 (mod 3) gets no robots.txt at all (404 →
    # allow-all must equal its allow-all parsed row).
    raw_hosts, raw_bodies = [], []
    for k in range(p.n_hosts):
        if k % 3 == 2 and r_rules[k] == [{"allow": True, "prefix": "/"}] and r_crawl_delay[k] is None:
            continue  # 404 host (only safe when its rules are allow-all)
        raw_hosts.append(hosts[k])
        raw_bodies.append(render_robots_txt(
            r_rules[k], r_crawl_delay[k],
            ua_specific=(k % 3 == 1),
        ))
    robots_raw = pd.DataFrame({"host": raw_hosts, "body": raw_bodies})

    return {"pages": pages, "seeds": seeds, "robots_txt": robots,
            "robots_raw": robots_raw}


def render_robots_txt(rules: list[dict], crawl_delay_ms: int | None,
                      ua_specific: bool = False,
                      ua_token: str = "pegasus-spark") -> str:
    """Render parsed rules back to robots.txt text such that
    ``parse_robots_text(render(...)) == (delay, sorted rules)``."""
    lines = ["# synthetic fixture robots.txt", "User-agent: evilbot",
             "Disallow: /", ""]
    lines.append(f"User-agent: {ua_token}" if ua_specific else "User-agent: *")
    for r in rules:
        key = "Allow" if r["allow"] else "Disallow"
        lines.append(f"{key}: {r['prefix']}")
    if crawl_delay_ms is not None:
        lines.append(f"Crawl-delay: {crawl_delay_ms / 1000:g}")
    if ua_specific:
        # deny-all fallback group: correct UA selection must prefer the
        # specific group above
        lines += ["", "User-agent: *", "Disallow: /"]
    return "\n".join(lines) + "\n"


_ROBOTS_ARROW = pa.schema([
    ("host", pa.string()),
    ("crawl_delay_ms", pa.int64()),
    ("rules", pa.list_(pa.struct([("allow", pa.bool_()), ("prefix", pa.string())]))),
])


def write_web(tables: dict[str, pd.DataFrame], out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, df in tables.items():
        if name == "robots_txt":
            t = pa.Table.from_pandas(df, schema=_ROBOTS_ARROW, preserve_index=False)
        else:
            t = pa.Table.from_pandas(df, preserve_index=False)
        # small row groups keep the file SPLITTABLE: Spark cannot split
        # below a row group, and the default (1Mi rows) would make the
        # whole page store a single scan/decode task. use_dictionary=False
        # because dictionary-encoding unique image blobs makes Spark's
        # reader materialize a whole-row-group dictionary per task.
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"),
                       row_group_size=2048, use_dictionary=False)


# ---- parallel generator for big scaling fixtures -----------------------
# The classic generate_web draws every page from ONE rng stream (bit-
# identical regeneration, but inherently serial). Scaling-evidence
# fixtures are 10^5-10^6 pages of 96-128px images — serial generation
# would take longer than the benchmark. generate_web_fast derives an
# independent child rng per page (seeded by (seed, page index)), so
# shards are generated and written in parallel with ANY worker count and
# still reproduce bit-identically. Content differs from generate_web for
# the same params — it is a distinct, equally deterministic generator.

_FAST = {"p": None, "host_idx": None, "hosts": None, "dims": None,
         "n_links": None, "out_dir": None}


def _fast_shard(args: tuple) -> int:
    lo, hi, shard_id = args
    p: WebParams = _FAST["p"]
    host_idx, hosts, dims, n_links = (
        _FAST["host_idx"], _FAST["hosts"], _FAST["dims"], _FAST["n_links"])
    rows = {k: [] for k in ("url", "url_hash", "host", "image_id", "bytes",
                            "w", "h", "fmt", "caption", "phash", "out_links",
                            "pixels_ref", "ref_md5")}
    for i in range(lo, hi):
        rng = np.random.default_rng((p.seed, i))
        w, h = int(dims[i, 0]), int(dims[i, 1])
        px = _make_pixels(rng, w, h)
        url = f"http://{hosts[host_idx[i]]}/p/{i}"
        uh = xxhash64_str(url)
        image_id = f"img-{uh & 0xFFFFFFFFFFFFFFFF:016x}"
        targets = rng.integers(0, p.n_pages, size=n_links[i])
        rows["url"].append(url)
        rows["url_hash"].append(uh)
        rows["host"].append(hosts[host_idx[i]])
        rows["image_id"].append(image_id)
        rows["bytes"].append(codec.encode(px, "png"))
        rows["w"].append(w)
        rows["h"].append(h)
        rows["fmt"].append("png")
        rows["caption"].append(_caption(rng, image_id))
        rows["phash"].append(codec.phash(px))
        rows["out_links"].append(
            [f"http://{hosts[host_idx[int(t)]]}/p/{int(t)}" for t in targets])
        rows["pixels_ref"].append(px.tobytes())
        rows["ref_md5"].append(hashlib.md5(px.tobytes()).hexdigest())
    df = pd.DataFrame({
        **{k: rows[k] for k in rows},
        "url_hash": np.array(rows["url_hash"], dtype=np.int64),
        "w": np.array(rows["w"], dtype=np.int32),
        "h": np.array(rows["h"], dtype=np.int32),
        "phash": np.array(rows["phash"], dtype=np.int64),
    })
    t = pa.Table.from_pandas(df, preserve_index=False)
    # use_dictionary=False: pyarrow's default dictionary-encodes EVERY
    # column — for the ~20-40 KB unique binary blobs (bytes, pixels_ref)
    # that stores each row group as one giant dictionary page, and Spark's
    # parquet reader then materializes + copies the whole dictionary per
    # task: measured 6× slowdown at local[32] (allocation/GC churn)
    pq.write_table(t, os.path.join(_FAST["out_dir"], f"part-{shard_id:05d}.parquet"),
                   row_group_size=1024, use_dictionary=False)
    return hi - lo


def generate_web_fast(p: WebParams, out_dir: str, procs: int = 16) -> str:
    """Parallel deterministic fixture writer: pages.parquet becomes a
    DIRECTORY of shards (Spark and pyarrow read it identically). Drain
    profile: every page is a seed (plain canonical form), all-png
    payloads."""
    from multiprocessing import Pool

    os.makedirs(out_dir, exist_ok=True)
    pages_dir = os.path.join(out_dir, "pages.parquet")
    os.makedirs(pages_dir, exist_ok=True)
    rng = np.random.default_rng(p.seed)
    hosts = [f"h{k}.example" for k in range(p.n_hosts)]
    host_idx = _zipf_host_assignment(rng, p.n_pages, p.n_hosts, p.zipf_s)
    dims = rng.integers(p.img_min, p.img_max + 1, size=(p.n_pages, 2))
    n_links = rng.poisson(p.fanout, size=p.n_pages)

    _FAST.update(p=p, host_idx=host_idx, hosts=hosts, dims=dims,
                 n_links=n_links, out_dir=pages_dir)
    shard = max(512, p.n_pages // (procs * 4))
    tasks = [(lo, min(lo + shard, p.n_pages), si)
             for si, lo in enumerate(range(0, p.n_pages, shard))]
    with Pool(procs) as pool:
        pool.map(_fast_shard, tasks, chunksize=1)

    n_seeds = min(p.n_seeds, p.n_pages)
    seed_pages = rng.choice(p.n_pages, size=n_seeds, replace=False)
    seeds = pd.DataFrame({
        "url": [f"http://{hosts[host_idx[int(t)]]}/p/{int(t)}" for t in seed_pages],
        "priority": np.zeros(n_seeds, dtype=np.int32),
    })
    pq.write_table(pa.Table.from_pandas(seeds, preserve_index=False),
                   os.path.join(out_dir, "seeds.parquet"), row_group_size=2048)
    # allow-all robots (politeness still applies via min_delay)
    robots = pd.DataFrame({
        "host": hosts,
        "crawl_delay_ms": pd.array([None] * p.n_hosts, dtype="Int64"),
        "rules": [[{"allow": True, "prefix": "/"}] for _ in hosts],
    })
    pq.write_table(pa.Table.from_pandas(robots, schema=_ROBOTS_ARROW,
                                        preserve_index=False),
                   os.path.join(out_dir, "robots_txt.parquet"))
    raw = pd.DataFrame({"host": hosts,
                        "body": [render_robots_txt([{"allow": True, "prefix": "/"}], None)
                                 for _ in hosts]})
    pq.write_table(pa.Table.from_pandas(raw, preserve_index=False),
                   os.path.join(out_dir, "robots_raw.parquet"))
    return out_dir


def materialize_fast(p: WebParams, base_dir: str, procs: int = 16) -> str:
    out = os.path.join(base_dir, "fast_" + p.tag())
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    generate_web_fast(p, out, procs)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def materialize(p: WebParams, base_dir: str) -> str:
    """Generate-once cache: write the fixture under ``base_dir/<tag>``."""
    out = os.path.join(base_dir, p.tag())
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    tables = generate_web(p)
    write_web(tables, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out
