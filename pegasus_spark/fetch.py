"""Fetch + payload validation (SURVEY.md §2 O6/O7).

shriphani/pegasus fetches with ``clj-http.client/get`` inside its
fetcher stage (``src/pegasus/defaults.clj`` — symbol cite per SURVEY.md
§0). The sandbox has no network, so "the web" is the deterministic
``pages`` table and fetch = an equi-join on ``url_hash`` — but the stage
keeps a UDF-shaped boundary so a real batched HTTP client slots in.

Payload validation is the graft-specific replacement for body parsing
(BASELINE.json input_hint): decode the image ``bytes``, require
bit-exact pixels for lossless ``png`` (md5(decoded) vs md5(ref), the
hash halves split across Python and columnar JVM so reference buffers
never cross the Arrow pipe), PSNR ≥ 40 dB for lossy ``qnt``, caption
equality, and a matching ``phash`` — one Arrow-batched pandas UDF
(numpy per image inside the batch; no per-row Python UDFs). The fetch/decode stage is the CPU-heavy part of a round,
so it runs AFTER all drops (robots/seen/politeness) and is re-shuffled
on the salted ``host_bucket``, not ``host`` — a hot host spreads over B
buckets instead of pinning one task (north-rule skew handling).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from . import codec
from .codec import phash as _phash, psnr as _psnr

PAGE_COLS = [
    "url_hash", "image_id", "bytes", "w", "h", "fmt",
    "caption", "phash", "out_links", "pixels_ref",
]


def load_pages(spark: SparkSession, web_dir: str,
               bucketed_dir: str | None = None) -> DataFrame:
    """Open the page store. ``bucketed_dir`` (see ``bucketize_store``)
    opens the bucket-partitioned layout instead — same rows, plus a
    ``_bucket`` partition column that downstream joins can prune on."""
    df = spark.read.parquet(bucketed_dir or f"{web_dir}/pages.parquet")
    cols = PAGE_COLS + (["ref_md5"] if "ref_md5" in df.columns else [])
    df = df.select(*cols, *(c for c in ("redirect_to", "flaky_until_round", "_bucket")
                            if c in df.columns))
    # stores generated before the 3xx/transient-failure semantics existed
    # behave as all-200: defaults keep every old fixture valid
    if "redirect_to" not in df.columns:
        df = df.withColumn("redirect_to", F.lit(None).cast("string"))
    if "flaky_until_round" not in df.columns:
        df = df.withColumn("flaky_until_round", F.lit(0).cast("int"))
    return df


def bucketize_store(spark: SparkSession, web_dir: str, n_buckets: int) -> str:
    """One-time physical relayout of the page store into ``bucket(B,
    url_hash)`` directory partitions (idempotent; cached beside the
    fixture). The 10^10-scale page store lives as a bucket-partitioned
    Iceberg table — layout is a property of the data at rest, not of any
    one crawl job — and this produces the sandbox equivalent so the
    giant-round fetch join can run bucket-wise (``bucketed_store_join``)
    instead of shuffling payload bytes.

    The cache key includes a fingerprint of the SOURCE files (paths,
    sizes, mtimes): a pages.parquet regenerated in the same web_dir gets
    a fresh relayout instead of silently reusing the stale one (ADVICE
    r4 #3)."""
    import hashlib
    import os

    src = f"{web_dir}/pages.parquet"
    h = hashlib.sha256()
    if os.path.isdir(src):
        for root, _dirs, files in sorted(os.walk(src)):
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                h.update(f"{os.path.relpath(os.path.join(root, f), src)}|"
                         f"{st.st_size}|{st.st_mtime_ns}".encode())
    else:
        st = os.stat(src)
        h.update(f"{st.st_size}|{st.st_mtime_ns}".encode())
    out = f"{web_dir}/pages_bucketed_{n_buckets}_{h.hexdigest()[:12]}"
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            spark.read.parquet(f"{web_dir}/pages.parquet")
            .withColumn("_bucket",
                        F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int"))
            .repartition(n_buckets, "_bucket")
            .write.mode("overwrite").partitionBy("_bucket")
            # blob-table writer shape (small row groups, no dictionary) —
            # same rationale as config.corpus_write_options
            .option("parquet.block.size", str(16 * 1024 * 1024))
            .option("parquet.enable.dictionary", "false")
            .parquet(out)
        )
    return out


def bucketed_store_join(pages: DataFrame, loadable: DataFrame,
                        n_buckets: int) -> tuple[DataFrame, DataFrame]:
    """Bucket-wise fetch join — the sandbox analogue of an Iceberg
    storage-partitioned join (SPJ) on a ``bucket(B, url_hash)`` table.

    The fat store side is directory-pruned per bucket and NEVER shuffled
    or globally broadcast; the selection (past the global broadcast
    ceiling, but skinny) is sliced per bucket by the same pmod and each
    1/B slice broadcasts into only its matching bucket scan. Total
    traffic: B broadcasts of |selection|/B rows — at the 10^10 design
    point (B=1024, a 10^8-row round) each slice is ~10^5 skinny rows,
    well inside executor memory, while the payload bytes move zero times.
    On a real Iceberg catalog Spark ≥3.3 plans this natively from the
    table's partition transform; here the per-bucket union IS the plan.

    Returns (inner, missing): store⋈selection rows and selection rows
    with no store page (HTTP-404 analogue), both per the caller's
    ``_final_hash`` key.
    """
    inner_parts, missing_parts = [], []
    # NULL join keys (junk-Location dangling rows) belong to no bucket:
    # route them straight to the missing side (same outcome as the
    # non-bucketed anti-join, where a NULL key never matches)
    missing_parts.append(loadable.where(F.col("_final_hash").isNull()))
    for b in range(n_buckets):
        sel_b = loadable.where(
            F.pmod(F.col("_final_hash"), F.lit(n_buckets)) == b)
        pg_b = pages.where(F.col("_bucket") == b).drop("_bucket")
        inner_parts.append(pg_b.join(F.broadcast(sel_b), "_final_hash", "inner"))
        # 404 check per bucket: the store's KEY column (column-pruned,
        # 8 B/row → |store|/B keys ≈ 80 MB at the design point) broadcasts
        # the other way
        missing_parts.append(sel_b.join(
            F.broadcast(pg_b.select("_final_hash")), "_final_hash", "left_anti"))
    inner = inner_parts[0]
    for p in inner_parts[1:]:
        inner = inner.unionByName(p)
    missing = missing_parts[0]
    for p in missing_parts[1:]:
        missing = missing.unionByName(p)
    return inner, missing


def store_has_lossy(pages: DataFrame) -> bool:
    """One cheap fmt-column probe at crawl start: when the store is
    all-lossless, the raw ``pixels_ref`` column can be pruned out of every
    fetch scan (validation runs entirely on stored checksums)."""
    return len(pages.where(F.col("fmt") != "png").limit(1).take(1)) > 0


def store_has_redirects(pages: DataFrame) -> bool:
    """Probe at crawl start: an all-200 store skips the whole redirect
    machinery (no mapping join, no extra chain-hop scans, no redirects
    append) — the round plan is identical to the pre-redirect engine."""
    return len(pages.where(F.col("redirect_to").isNotNull()).limit(1).take(1)) > 0


def store_has_flaky(pages: DataFrame) -> bool:
    """Probe at crawl start: a never-failing store skips the retry split
    and the retries-table bookkeeping entirely."""
    return len(pages.where(F.col("flaky_until_round") > 0).limit(1).take(1)) > 0


from pyspark.sql.types import (
    BooleanType, DoubleType, LongType, StringType, StructField, StructType,
)

_decode_schema = StructType([
    StructField("decode_ok", BooleanType()),
    StructField("pix_md5", StringType()),    # md5 of decoded raw pixels (lossless rows)
    StructField("phash_chk", LongType()),    # phash(decoded) lossless / phash(ref) lossy
    StructField("psnr", DoubleType()),       # measured only for lossy rows
    StructField("lossy_ok", BooleanType()),  # PSNR≥40 verdict for lossy rows
])


@F.pandas_udf(_decode_schema)
def validate_decode(
    data: pd.Series, fmt: pd.Series, w: pd.Series, h: pd.Series,
    ref_lossy: pd.Series,
) -> pd.DataFrame:
    """Python half of payload validation — decodes and summarizes.

    The reference pixel buffers deliberately do NOT cross the JVM→Python
    boundary for lossless rows: this VM (and any real cluster's Python
    boundary) is throughput-bound on the Arrow pipe, and the refs double
    the transfer. Instead Python returns md5(decoded) and the JVM
    compares it against md5(pixels_ref) computed columnar-side — the
    same bit-exactness check, ~3× less pipe traffic. Lossy rows need
    PSNR against the ref, so ONLY those rows carry ``ref_lossy``."""
    import hashlib

    n = len(data)
    ok = np.zeros(n, dtype=bool)
    md5s = np.full(n, None, dtype=object)
    phs = np.zeros(n, dtype=np.int64)
    psnr_out = np.full(n, np.nan)
    lossy_ok = np.zeros(n, dtype=bool)
    for i in range(n):  # numpy per image; Arrow batch transport
        try:
            dec = codec.decode(data.iloc[i], fmt.iloc[i])
            ok[i] = True
            ref_b = ref_lossy.iloc[i]
            if ref_b is None:  # lossless: hash the decode, JVM compares
                md5s[i] = hashlib.md5(np.ascontiguousarray(dec).tobytes()).hexdigest()
                phs[i] = _phash(dec)
            else:  # lossy: PSNR + phash against the shipped ref
                ref = np.frombuffer(ref_b, dtype=np.uint8).reshape(
                    int(h.iloc[i]), int(w.iloc[i]), 3
                )
                p = _psnr(dec, ref)
                psnr_out[i] = min(p, 99.0) if np.isfinite(p) else 99.0
                lossy_ok[i] = bool(p >= 40.0)
                phs[i] = _phash(ref)
        except Exception:
            ok[i] = False
    return pd.DataFrame({
        "decode_ok": ok, "pix_md5": md5s, "phash_chk": phs,
        "psnr": psnr_out, "lossy_ok": lossy_ok,
    })


# fetch_status values a corpus row can carry. 'ok'/'missing' are the
# direct outcomes; 'redirect' = followed to a terminal page (payload is
# the target's, final_url records it); the three NOLOAD statuses mark
# fetches whose content was never retrieved (loop / hop cap / transient
# failures out of attempts) — payload columns stay null, valid=false.
NOLOAD_STATUSES = ("redirect_loop", "redirect_cap", "transient_exhausted")


def resolve_redirects(selected: DataFrame, pages: DataFrame, canon_expr,
                      max_hops: int = 4) -> DataFrame | None:
    """Resolve 3xx chains for selected rows whose page is a redirect
    (pegasus's fetcher follows redirects inside the fetch itself —
    clj-http's default — so the chain is followed inline, not re-queued
    through politeness).

    Returns one row per redirect SOURCE: (url_hash, final_hash,
    final_url, fetch_status, chain) where ``chain`` lists every url_hash
    the chain touched (source first; every touched URL becomes visited)
    and fetch_status ∈ redirect | redirect_dangling | redirect_loop |
    redirect_cap — or **None** when this round's selection contains no
    redirect source at all (the caller then runs the exact plain-round
    plan). ``canon_expr(base, href)`` canonicalizes each Location target
    against the redirecting URL; an UNCANONICALIZABLE Location (junk
    href → canon NULL) terminates the chain as ``redirect_dangling``
    with NULL final_hash/final_url — the junk target is never hashed,
    requested, or entered into the visited set (tests/oracle.py
    resolve_chain mirrors this).

    Physical shape: each hop is ONE column-pruned scan of the store's
    (url_hash, redirect_to) joined with the (tiny, selection-bounded)
    live-chain set broadcast into it — the sandbox stand-in for batched
    HTTP GETs, same as the main fetch join; at 10^10 the store is
    bucketed on url_hash so these are point-lookup scans. The live set
    is materialized per hop (localCheckpoint of a selection-bounded
    skinny frame) and the loop SHORT-CIRCUITS the moment it drains —
    typical rounds carry 0-2 short chains, so most rounds pay zero or
    one hop's store scan instead of 3·max_hops union branches
    (VERDICT r4 wrong #2: the fixed per-round cost was ~1/3 of the
    parity-suite wall).
    """
    pr = pages.select(
        F.col("url_hash").alias("_t_hash"), F.col("redirect_to").alias("_t_redir")
    )
    hash_or_null = F.when(F.col("cur_url").isNotNull(), F.xxhash64("cur_url"))
    cur = (
        selected.select("url_hash", "url")
        .join(pr, F.col("url_hash") == F.col("_t_hash"), "inner")
        .where(F.col("_t_redir").isNotNull())
        .select(
            F.col("url_hash").alias("src_hash"),
            F.array("url_hash").alias("chain"),
            canon_expr(F.col("url"), F.col("_t_redir")).alias("cur_url"),
        )
        .withColumn("cur_hash", hash_or_null)
        .localCheckpoint(eager=True)
    )
    if not cur.take(1):
        return None
    out_cols = ["src_hash", "chain", "cur_url", "cur_hash", "fetch_status"]
    done: list[DataFrame] = []
    for _hop in range(max_hops):
        # junk Location: canon produced NULL → dangling, chain unchanged
        done.append(cur.where(F.col("cur_hash").isNull())
                    .withColumn("fetch_status", F.lit("redirect_dangling"))
                    .select(*out_cols))
        cur = cur.where(F.col("cur_hash").isNotNull())
        # loop check BEFORE following: next target already in this chain
        looped = F.array_contains("chain", F.col("cur_hash"))
        done.append(cur.where(looped).withColumn("fetch_status", F.lit("redirect_loop"))
                    .select(*out_cols))
        cur = cur.where(~looped)
        # follow one hop: right join so the tiny chain side broadcasts
        # into the store scan (never the reverse)
        j = pr.join(F.broadcast(cur), F.col("_t_hash") == F.col("cur_hash"), "right")
        touched = F.concat("chain", F.array("cur_hash"))
        done.append(  # target not in the store: 404 mid-chain
            j.where(F.col("_t_hash").isNull())
            .select("src_hash", touched.alias("chain"), "cur_url", "cur_hash",
                    F.lit("redirect_dangling").alias("fetch_status"))
        )
        done.append(  # terminal content page reached
            j.where(F.col("_t_hash").isNotNull() & F.col("_t_redir").isNull())
            .select("src_hash", touched.alias("chain"), "cur_url", "cur_hash",
                    F.lit("redirect").alias("fetch_status"))
        )
        cur = (
            j.where(F.col("_t_redir").isNotNull())
            .select("src_hash", touched.alias("chain"),
                    canon_expr(F.col("cur_url"), F.col("_t_redir")).alias("cur_url"))
            .withColumn("cur_hash", hash_or_null)
            .localCheckpoint(eager=True)
        )
        if not cur.take(1):  # every chain terminated: skip remaining hops
            break
    else:
        # hop budget exhausted with live chains: the next target is never
        # requested — junk Locations from the final hop are still dangling
        done.append(cur.where(F.col("cur_hash").isNull())
                    .withColumn("fetch_status", F.lit("redirect_dangling"))
                    .select(*out_cols))
        done.append(cur.where(F.col("cur_hash").isNotNull())
                    .withColumn("fetch_status", F.lit("redirect_cap"))
                    .select(*out_cols))
    mapping = done[0]
    for d in done[1:]:
        mapping = mapping.unionByName(d)
    return mapping.select(
        F.col("src_hash").alias("url_hash"),
        F.col("cur_hash").alias("final_hash"),
        F.col("cur_url").alias("final_url"),
        "fetch_status", "chain",
    )


def split_flaky(selected: DataFrame, pages: DataFrame, retries: DataFrame,
                current_round: int, max_attempts: int,
                mapping: DataFrame | None = None) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Transient-failure split: a CONTENT fetch whose page has
    ``flaky_until_round > r`` fails this round (a deterministic 503
    analogue). ``flaky_until_round`` models the *content* fetch only:
    3xx responses are always served (the fixture keeps redirect pages
    reliable), so with ``mapping`` (redirect resolutions) present the
    gate keys on the CONTENT page — the chain's final target for
    followed ('redirect') chains, the page itself for plain fetches.
    A chain that terminates at a transiently-failing page therefore
    fails the WHOLE source fetch transiently (real-fetch fidelity:
    clj-http following a 3xx into a 503 surfaces the failure — ADVICE
    r4 #1); chains that never reach content (loop/cap/dangling) keep
    their terminal status and never transiently fail.

    Returns (fetchable, retry_rows, exhausted):

    - fetchable: rows whose fetch proceeds normally;
    - retry_rows: (url_hash, round) to append to the retries table — the
      URL writes NO corpus row, so it stays pending (frontier ⟕̸ visited)
      and politeness re-schedules it next round; its slot this round was
      still consumed (host clocks advance over the full selection). A
      retried redirect SOURCE re-walks its chain on the retry attempt —
      its chain members do NOT enter the visited set this round;
    - exhausted: rows on their max_attempts-th failed attempt — recorded
      as a 'transient_exhausted' corpus row (permanently visited, no
      payload, no final_url; chain members stay unvisited — the content
      was never retrieved), pegasus's treat-failing-URL-as-consumed
      behavior.
    """
    fl = pages.select(F.col("url_hash").alias("_c_hash"), "flaky_until_round")
    if mapping is not None:
        m = mapping.select(
            "url_hash",
            F.col("final_hash").alias("_f_hash"),
            F.col("fetch_status").alias("_m_status"),
        )
        content = F.when(F.col("_m_status") == "redirect", F.col("_f_hash")).when(
            F.col("_m_status").isNull(), F.col("url_hash"))
        s0 = (selected.join(F.broadcast(m), "url_hash", "left")
              .withColumn("_c_hash", content).drop("_f_hash", "_m_status"))
    else:
        s0 = selected.withColumn("_c_hash", F.col("url_hash"))
    att = retries.groupBy("url_hash").agg(F.count("*").alias("_attempts"))
    s = (
        s0.join(fl, "_c_hash", "left")
        .join(att, "url_hash", "left")
        .withColumn(
            "_fail",
            F.coalesce(F.col("flaky_until_round") > F.lit(current_round), F.lit(False)),
        )
        .withColumn("_attempts", F.coalesce(F.col("_attempts"), F.lit(0)))
    )
    aux = ["_c_hash", "flaky_until_round", "_fail", "_attempts"]
    fetchable = s.where(~F.col("_fail")).drop(*aux)
    failing = s.where(F.col("_fail"))
    retry_rows = failing.where(F.col("_attempts") + 1 < max_attempts).select(
        "url_hash", F.lit(current_round).cast("int").alias("round")
    )
    exhausted = failing.where(F.col("_attempts") + 1 >= max_attempts).drop(*aux)
    return fetchable, retry_rows, exhausted


def fetch_and_validate(
    selected: DataFrame,
    pages: DataFrame,
    host_buckets: int,
    validate: bool = True,
    selection_count: int | None = None,
    broadcast_max: int = 2_000_000,
    has_lossy: bool | None = None,
    mapping: DataFrame | None = None,
    store_buckets: int = 0,
) -> DataFrame:
    """Join selected frontier rows against the page store and validate.

    Missing pages (dangling links that slipped in as seeds) behave as
    HTTP 404: the URL still counts as visited (pegasus marks it visited
    too), payload columns are null, valid=false, fetch_status='missing'.

    ``mapping`` (optional, selection-bounded small) carries redirect
    resolutions and transient-exhaustion marks: (url_hash, final_hash,
    final_url, fetch_status). Rows mapped to a NOLOAD status skip the
    payload join entirely; 'redirect' rows load the FINAL page's payload
    and validate it as usual, with final_url recorded on the corpus row.
    """
    # host_bucket is a lineage/metrics column; the PHYSICAL skew-spread of
    # the decode stage comes for free from hash partitioning on url_hash —
    # uniform regardless of host skew, so one hot host's pages spread
    # evenly across tasks.
    salted = selected.withColumn(
        "host_bucket",
        F.pmod(F.xxhash64("host"), F.lit(host_buckets)).cast("int"),
    )
    if mapping is not None:
        m = mapping.select(
            "url_hash",
            F.col("final_hash").alias("_final_hash"),
            "final_url",
            F.col("fetch_status").alias("_status0"),
        )
        salted = (
            salted.join(F.broadcast(m), "url_hash", "left")
            # rows WITHOUT a mapping entry load their own page; mapped rows
            # keep the mapping's final_hash AS IS — a junk-Location
            # dangling row carries NULL final_hash on purpose (NULL join
            # keys match nothing → the row falls through to the missing
            # branch with its redirect_dangling status, payload all-NULL)
            .withColumn(
                "_final_hash",
                F.when(F.col("_status0").isNull(),
                       F.coalesce("_final_hash", "url_hash"))
                .otherwise(F.col("_final_hash")),
            )
        )
    else:
        salted = (
            salted.withColumn("_final_hash", F.col("url_hash"))
            .withColumn("final_url", F.lit(None).cast("string"))
            .withColumn("_status0", F.lit(None).cast("string"))
        )
    is_noload = F.coalesce(F.col("_status0").isin(*NOLOAD_STATUSES), F.lit(False))
    noload = salted.where(is_noload)
    loadable = salted.where(~is_noload)
    # the payload join keys on the CONTENT hash (≡ url_hash except for
    # followed redirects); the store's control columns are pruned here
    pages = pages.drop("redirect_to", "flaky_until_round")
    # Size-gated join strategy. Small rounds (the politeness-bounded norm)
    # broadcast the selection INTO the store — map-side join, the store is
    # never shuffled. Rounds past broadcast_max rows (10^7-10^8-URL rounds
    # at the 10^10 design point would blow the broadcast ceiling) fall
    # back to a co-partitioned shuffle join on url_hash instead. When the
    # caller doesn't know the count (selection_count=None) it broadcasts:
    # that path only exists for politeness-bounded selections. At real
    # scale "pages" is HTTP and fetch is a mapInPandas over the selection
    # only; the page store here is the sandbox network stand-in.
    small = (broadcast_max > 0) and (
        selection_count is None or selection_count <= broadcast_max
    )
    if validate:
        # shrink the fat ref column AT THE SCAN: lossless rows reduce to a
        # 32-char md5 (stored in the fixture, else hashed columnar-side);
        # only lossy rows keep raw refs (PSNR needs both sides). The UDF
        # input row is then ~bytes-sized, which also bounds the JVM-side
        # buffered-row queue of the pandas-UDF exchange — and when the
        # store has no lossy rows at all (has_lossy=False), pixels_ref is
        # pruned out of the parquet scan entirely.
        ref_md5 = F.col("ref_md5") if "ref_md5" in pages.columns else F.md5("pixels_ref")
        pages = pages.withColumn("_ref_md5", ref_md5)
        if has_lossy is None or has_lossy:
            pages = pages.withColumn(
                "_ref_lossy", F.when(F.col("fmt") != "png", F.col("pixels_ref"))
            )
        else:
            pages = pages.withColumn("_ref_lossy", F.lit(None).cast("binary"))
        pages = pages.drop("pixels_ref", "ref_md5")
    pages = pages.withColumnRenamed("url_hash", "_final_hash")
    if not small and store_buckets > 0 and "_bucket" in pages.columns:
        # giant-round path over a bucket-partitioned store: SPJ-shaped
        # bucket-wise join, zero payload shuffle (see bucketed_store_join)
        inner, missing = bucketed_store_join(pages, loadable, store_buckets)
    else:
        if "_bucket" in pages.columns:
            pages = pages.drop("_bucket")
        sel_in = F.broadcast(loadable) if small else loadable
        keys_in = (F.broadcast(pages.select("_final_hash")) if small
                   else pages.select("_final_hash"))
        inner = pages.join(sel_in, "_final_hash", "inner")
        missing = loadable.join(keys_in, "_final_hash", "left_anti")
    joined = inner.unionByName(missing.unionByName(noload), allowMissingColumns=True)
    if validate:
        joined = joined.withColumn(
            "_v", validate_decode("bytes", "fmt", "w", "h", "_ref_lossy")
        )
        lossless_ok = (F.col("fmt") == "png") & (F.col("_v.pix_md5") == F.col("_ref_md5"))
        lossy_ok = (F.col("fmt") != "png") & F.col("_v.lossy_ok")
        valid = (
            F.col("_v.decode_ok")
            & (F.col("_v.phash_chk") == F.col("phash"))
            & (lossless_ok | lossy_ok)
        )
        joined = joined.select(
            "*",
            F.coalesce(valid, F.lit(False)).alias("valid"),
            # lossless rows are bit-exact when valid → PSNR is ∞, reported
            # as the 99.0 cap (same convention as the lossy branch)
            F.when(valid & (F.col("fmt") == "png"), F.lit(99.0))
            .otherwise(F.col("_v.psnr")).alias("psnr"),
        ).drop("_v", "_ref_md5", "_ref_lossy")
    else:
        joined = joined.withColumn("valid", F.col("bytes").isNotNull()).withColumn(
            "psnr", F.lit(None).cast("double")
        ).drop("pixels_ref", "ref_md5")
    return joined.withColumn(
        "fetch_status",
        F.coalesce(
            F.col("_status0"),
            F.when(F.col("bytes").isNull(), F.lit("missing")).otherwise(F.lit("ok")),
        ),
    ).drop("_status0", "_final_hash")
