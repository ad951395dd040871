import os, sys, time, json, urllib.request, glob
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

cpus = int(sys.argv[1])
import os
spark = (SparkSession.builder.master(f"local[{cpus}]")
    .appName("diag")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", "4099")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
    .config("spark.sql.parquet.columnarReaderBatchSize", "256")
    .config("spark.sql.files.maxPartitionBytes", "64m")
    .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
    .config("spark.driver.extraJavaOptions", os.environ.get("PEGASUS_JAVA_OPTS", ""))
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
d = glob.glob("/root/repo/BENCH/fixtures/fast_s42_p150000*/pages.parquet")[0]
pages = spark.read.parquet(d)

t0=time.monotonic()
n = pages.select(F.sum(F.octet_length("bytes")+F.octet_length("pixels_ref")).alias("s")).collect()[0]["s"]
print(f"JVM-only scan+sum: {time.monotonic()-t0:.1f}s ({n/1e9:.1f} GB)", flush=True)

from pegasus_spark.fetch import validate_decode
t0=time.monotonic()
ref_md5 = F.col("ref_md5") if "ref_md5" in pages.columns else F.md5("pixels_ref")
base = (pages.select("bytes","fmt","w","h","phash", ref_md5.alias("_ref_md5"),
                     F.when(F.col("fmt") != "png", F.col("pixels_ref")).alias("_ref_lossy"))
    .withColumn("_v", validate_decode("bytes","fmt","w","h","_ref_lossy")))
v = F.col("_v")
valid = (v["decode_ok"] & (v["phash_chk"] == F.col("phash"))
    & (((F.col("fmt") == "png") & (v["pix_md5"] == F.col("_ref_md5")))
       | ((F.col("fmt") != "png") & v["lossy_ok"])))
row = base.agg(F.sum(valid.cast("long")).alias("v"), F.count("*").alias("n")).collect()[0]
dt = time.monotonic()-t0
print(f"scan+UDF decode: {dt:.1f}s valid={row['v']}/{row['n']}", flush=True)

app = json.load(urllib.request.urlopen("http://localhost:4099/api/v1/applications"))[0]["id"]
stages = json.load(urllib.request.urlopen(f"http://localhost:4099/api/v1/applications/{app}/stages?status=complete"))
for s in stages[:6]:
    print(json.dumps({k: s.get(k) for k in ("stageId","numCompleteTasks","executorRunTime","executorCpuTime","jvmGcTime","inputBytes")}), flush=True)
