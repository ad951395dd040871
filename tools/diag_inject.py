import os, sys, time, glob, tempfile
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from bench import make_spark, _warm_crawl_path
spark = make_spark(32)
spark.sparkContext.setLogLevel("ERROR")
web = glob.glob("/root/repo/BENCH/fixtures/fast_s42_p150000*")[0]
_warm_crawl_path(spark, web)

from pegasus_spark.config import CrawlConfig
from pegasus_spark.crawl import _make_ctx
from pegasus_spark.round import inject_seeds
import pyspark.sql.functions as F

cfg = CrawlConfig(web_dir=web, job_dir=tempfile.mkdtemp(), round_width_vt=2_000_000,
                  seen_parts=8, host_buckets=32, cache_pages=False)
t0 = time.monotonic()
ctx, ckpt = _make_ctx(spark, cfg)
print(f"make_ctx: {time.monotonic()-t0:.1f}s", flush=True)
seeds_df = spark.read.parquet(f"{web}/seeds.parquet")
t0 = time.monotonic()
inject_seeds(ctx, seeds_df)
print(f"inject_seeds: {time.monotonic()-t0:.1f}s", flush=True)

# --- manual flow (diag_enqueue style) in the SAME session ---
from pegasus_spark.round import canonicalize_links, dedupe_candidates
from pegasus_spark.robots import load_rules_df, make_gate, path_of
from pegasus_spark.seen import SeenSet
from pegasus_spark.tables import ManifestCatalog
from pyspark.sql import Observation

seeds = spark.read.parquet(f"{web}/seeds.parquet")
links = seeds.select(F.col("url").alias("base_url"), F.col("url").alias("href"),
                     (F.col("priority")-1).alias("parent_priority"),
                     F.lit(None).cast("long").alias("src_url_hash")).repartition(32)
cat2 = ManifestCatalog(spark, tempfile.mkdtemp())
cat2.create("frontier", "url string, url_hash long, host string, priority int, discovered_round int, src_url_hash long")
seen2 = SeenSet(cat2, n_parts=8, exact_source=lambda: cat2.read("frontier"))
gate = make_gate(load_rules_df(spark, f"{web}/robots_txt.parquet"))
cand2 = dedupe_candidates(canonicalize_links(links))
obs_f, obs_n = Observation(), Observation()
flagged2 = gate(cand2).observe(
    obs_f, F.count(F.lit(1)).alias("n"), F.sum(F.col("allowed").cast("long")).alias("n_allowed"))
new2 = seen2.filter_new(flagged2.filter("allowed").drop("allowed")).observe(
    obs_n, F.count(F.lit(1)).alias("n_new")).persist()
rows2 = new2.select("url","url_hash","host","priority",F.lit(0).cast("int").alias("discovered_round"),"src_url_hash")
t0 = time.monotonic()
cat2.append("frontier", rows2)
print(f"MANUAL frontier append: {time.monotonic()-t0:.1f}s", flush=True)
