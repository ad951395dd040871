import os, sys, time, glob
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

cpus = int(sys.argv[1])
os.environ["ARROW_DEFAULT_MEMORY_POOL"] = os.environ.get("PEGASUS_ARROW_POOL", "system")
os.environ["MALLOC_CONF"] = "dirty_decay_ms:-1,muzzy_decay_ms:-1"
spark = (SparkSession.builder.master(f"local[{cpus}]")
    .appName("diag-noop")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.driver.memory", os.environ.get("PEGASUS_DRIVER_MEM", "10g"))
    .config("spark.driver.extraJavaOptions", os.environ.get("PEGASUS_JAVA_OPTS", "-XX:+UseParallelGC -XX:ParallelGCThreads=8 -XX:+AlwaysPreTouch"))
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", os.environ.get("PEGASUS_ARROW_BATCH", "64"))
    .config("spark.sql.parquet.columnarReaderBatchSize", "256")
    .config("spark.sql.files.maxPartitionBytes", "64m")
    .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
d = glob.glob("/root/repo/BENCH/fixtures/fast_s42_p150000*/pages.parquet")[0]
pages = spark.read.parquet(d).select("bytes","fmt","w","h","pixels_ref","phash")

import pandas as pd
def noop(batches):
    for pdf in batches:
        yield pd.DataFrame({"n": [len(pdf)]})

t0=time.monotonic()
row = pages.mapInPandas(noop, schema="n long").agg(F.sum("n").alias("n")).collect()[0]
print(f"noop transfer: {time.monotonic()-t0:.1f}s rows={row['n']}", flush=True)

# and a python-only decode job: ship ONLY what decode needs minus refs? full kernel needs refs.
# second variant: JVM scan only feeding nothing (baseline)
t0=time.monotonic()
n = pages.select(F.sum(F.octet_length("bytes")+F.octet_length("pixels_ref")).alias("s")).collect()[0]["s"]
print(f"scan only: {time.monotonic()-t0:.1f}s ({n/1e9:.1f} GB)", flush=True)
