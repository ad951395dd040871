import os, sys, time, glob, tempfile
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
spark = (SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.driver.memory", "10g")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC -XX:ParallelGCThreads=8 -XX:+AlwaysPreTouch")
    .config("spark.ui.enabled", "false").config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    .config("spark.sql.parquet.columnarReaderBatchSize", "256")
    .config("spark.sql.files.maxPartitionBytes", "32m")
    .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

web = glob.glob("/root/repo/BENCH/fixtures/fast_s42_p150000*")[0]
from pegasus_spark.round import canonicalize_links, dedupe_candidates
from pegasus_spark.robots import load_rules_df, make_gate, path_of
from pegasus_spark.seen import SeenSet
from pegasus_spark.tables import ManifestCatalog

T = time.monotonic
def lap(label, t0): print(f"{label}: {T()-t0:.1f}s", flush=True); return T()

seeds = spark.read.parquet(f"{web}/seeds.parquet")
links = seeds.select(F.col("url").alias("base_url"), F.col("url").alias("href"),
                     (F.col("priority")-1).alias("parent_priority"),
                     F.lit(None).cast("long").alias("src_url_hash")).repartition(cpus)
t0 = T()
cand = dedupe_candidates(canonicalize_links(links))
n = cand.count(); t0 = lap(f"canon+dedupe count ({n})", t0)
cand = cand.persist(); cand.count(); t0 = lap("persist cand", t0)

gate = make_gate(load_rules_df(spark, f"{web}/robots_txt.parquet"))
flagged = gate(cand)
n2 = flagged.filter("allowed").count(); t0 = lap(f"robots gate count ({n2})", t0)

cat = ManifestCatalog(spark, tempfile.mkdtemp())
cat.create("frontier", "url string, url_hash long, host string, priority int, discovered_round int, src_url_hash long")
seen = SeenSet(cat, n_parts=8)
new = seen.filter_new(flagged.filter("allowed").drop("allowed"))
rows = new.select("url", "url_hash", "host", "priority", F.lit(0).cast("int").alias("discovered_round"), "src_url_hash")
cat.append("frontier", rows); t0 = lap("frontier append", t0)
seen.add(new.select("url_hash")); t0 = lap("seen.add (append+bloom merge)", t0)

# probe again with non-empty bloom (extract-path shape)
out = seen.filter_new(cand.select("url_hash", "url", "host", "priority", "src_url_hash"))
n3 = out.count(); t0 = lap(f"filter_new vs 150k seen, count ({n3})", t0)

# --- mimic the REAL enqueue_new flow step by step (fresh catalog) ---
from pyspark.sql import Observation
cat2 = ManifestCatalog(spark, tempfile.mkdtemp())
cat2.create("frontier", "url string, url_hash long, host string, priority int, discovered_round int, src_url_hash long")
seen2 = SeenSet(cat2, n_parts=8)
cand2 = dedupe_candidates(canonicalize_links(links))
t0 = T()
obs_f = Observation()
flagged2 = gate(cand2).observe(
    obs_f, F.count(F.lit(1)).alias("n"), F.sum(F.col("allowed").cast("long")).alias("n_allowed"))
obs_n = Observation()
new2 = seen2.filter_new(flagged2.filter("allowed").drop("allowed")).observe(
    obs_n, F.count(F.lit(1)).alias("n_new")).persist()
rows2 = new2.select("url","url_hash","host","priority",F.lit(0).cast("int").alias("discovered_round"),"src_url_hash")
cat2.append("frontier", rows2); t0 = lap("ENQ frontier append job", t0)
cf = obs_f.get; t0 = lap("ENQ obs_f.get", t0)
nn = obs_n.get; t0 = lap("ENQ obs_n.get", t0)
seen2.add(new2.select("url_hash")); t0 = lap("ENQ seen.add", t0)
print("counts:", cf, nn, flush=True)
