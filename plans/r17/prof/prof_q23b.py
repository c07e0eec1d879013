import os, sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
from gelly_streaming_spark.blas import blas_env
from gelly_streaming_spark.session import BUILD_CONFS, RUNTIME_CONFS
os.environ.update(blas_env(1))
b = SparkSession.builder.appName("prof").master("local[32]")
for k, v in {**BUILD_CONFS, **RUNTIME_CONFS}.items():
    b = b.config(k, v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"
from gelly_streaming_spark.sources.tables import load_table
emb = load_table(spark, sf_dir, "embeddings")
t0=time.time(); n = emb.count(); print(f"count {time.time()-t0:.2f} n={n}")
t0=time.time(); dim = len(emb.select("embedding").head()[0]); print(f"head {time.time()-t0:.2f} dim={dim}")
# phase: chunks build
rows = emb.select(F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("v"))
n_blocks = max(1, -(-n // 8192))
print("n_blocks:", n_blocks)
from gelly_streaming_spark.ext.embeddings import embedding_near_dup_pairs
for r in range(3):
    t0=time.time()
    embedding_near_dup_pairs(emb, threshold=0.38, exact=True).write.mode("overwrite").format("noop").save()
    print(f"q23b full run{r} {time.time()-t0:.2f}")
# time chunks job alone
chunks = rows.withColumn("blk", F.pmod(F.xxhash64("id"), F.lit(n_blocks))).groupBy("blk").agg(F.collect_list(F.struct("id","v")).alias("rows"))
t0=time.time(); chunks.write.mode("overwrite").format("noop").save(); print(f"chunks job {time.time()-t0:.2f}")
# pure numpy GEMM timing driver-side
import numpy as np
t0=time.time()
tbl = rows.toArrow()
ids = tbl["id"].to_numpy()
mat = np.stack(tbl["v"].to_pylist())
print(f"collect+stack {time.time()-t0:.2f} shape={mat.shape}")
from gelly_streaming_spark.blas import pin_blas_threads
pin_blas_threads()
t0=time.time()
norm = np.linalg.norm(mat, axis=1)
raw = (mat @ mat.T) / (norm[:,None]*norm[None,:])
print(f"gemm {time.time()-t0:.2f}")
spark.stop()
