"""One-shot probe: blocked_cosine_dups at the 200k-row corpus (100x)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from baseline_embeddings_100x import build, OUTROOT, THRESHOLD
from pyspark.sql import SparkSession

build()
spark = (SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS','32')}]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "24g")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .appName("probe200k").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from clickhouse_datafusion_spark.operators.similarity import blocked_cosine_dups
emb = spark.read.parquet(os.path.join(OUTROOT, "100x", "embeddings.parquet"))
dim = len(emb.select("embedding").first()[0])
t0 = time.perf_counter()
n = blocked_cosine_dups(emb, threshold=THRESHOLD, dim=dim).count()
print(f"PAIRS_200K n={n} wall={time.perf_counter()-t0:.1f}s", flush=True)
