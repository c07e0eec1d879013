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
from gelly_streaming_spark.ext.embeddings import _gemm_pairs_fn
emb = load_table(spark, sf_dir, "embeddings")
rows = emb.select(F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("v"))
def phases():
    t0=time.time(); n = rows.count(); t_count=time.time()-t0
    n_blocks = max(1, -(-n // 8192))
    chunks = rows.withColumn("blk", F.pmod(F.xxhash64("id"), F.lit(n_blocks))).groupBy("blk").agg(F.collect_list(F.struct("id","v")).alias("rows"))
    idx = spark.range(n_blocks).select(F.col("id").alias("i")).join(spark.range(n_blocks).select(F.col("id").alias("j"))).where(F.col("i") <= F.col("j"))
    paired = (idx.join(chunks.select(F.col("blk").alias("i"), F.col("rows").alias("rows_l")), "i")
                 .join(chunks.select(F.col("blk").alias("j"), F.col("rows").alias("rows_r")), "j")
                 .repartition(F.col("i"), F.col("j")))
    t0=time.time(); paired.write.mode("overwrite").format("noop").save(); t_paired=time.time()-t0
    t0=time.time(); paired.mapInPandas(_gemm_pairs_fn(0.38), "a long, b long, sim double").write.mode("overwrite").format("noop").save(); t_full=time.time()-t0
    return t_count, t_paired, t_full
for r in range(8):
    c,p,f = phases()
    print(f"run{r}: count={c:.2f} paired={p:.2f} full={f:.2f}", flush=True)
spark.stop()
