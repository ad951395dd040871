import os, sys, time, glob
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

cpus = int(sys.argv[1])
spark = (SparkSession.builder.master(f"local[{cpus}]")
    .appName("diag-mip")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.driver.memory", os.environ.get("PEGASUS_DRIVER_MEM", "10g"))
    .config("spark.driver.extraJavaOptions", os.environ.get("PEGASUS_JAVA_OPTS", "-XX:+UseParallelGC"))
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
    .config("spark.sql.parquet.columnarReaderBatchSize", "256")
    .config("spark.sql.files.maxPartitionBytes", "64m")
    .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
d = glob.glob("/root/repo/BENCH/fixtures/fast_s42_p150000*/pages.parquet")[0]
pages = spark.read.parquet(d).select("bytes","fmt","w","h","pixels_ref","phash")

import pandas as pd, numpy as np
def validate_stream(batches):
    from pegasus_spark import codec
    for pdf in batches:
        n = len(pdf)
        valid = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                dec = codec.decode(pdf["bytes"].iloc[i], pdf["fmt"].iloc[i])
                ref = np.frombuffer(pdf["pixels_ref"].iloc[i], dtype=np.uint8).reshape(int(pdf["h"].iloc[i]), int(pdf["w"].iloc[i]), 3)
                p = codec.psnr(dec, ref)
                ok = np.array_equal(dec, ref) if pdf["fmt"].iloc[i] == "png" else p >= 40.0
                valid[i] = bool(ok and codec.phash(ref) == int(pdf["phash"].iloc[i]))
            except Exception:
                pass
        yield pd.DataFrame({"valid": valid})

t0=time.monotonic()
row = (pages.mapInPandas(validate_stream, schema="valid boolean")
    .agg(F.sum(F.col("valid").cast("long")).alias("v"), F.count("*").alias("n")).collect()[0])
print(f"mapInPandas decode: {time.monotonic()-t0:.1f}s valid={row['v']}/{row['n']}", flush=True)
