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
from gelly_streaming_spark.ext.text import doc_shingles, duplicate_passages
docs = load_table(spark, sf_dir, "documents")
docs.write.mode("overwrite").format("noop").save()
def t(label, df):
    for r in range(3):
        t0=time.time(); df.write.mode("overwrite").format("noop").save()
        print(f"{label} run{r}: {time.time()-t0:.2f}", flush=True)
sh = doc_shingles(docs, 8, hashed=True)
t("shingles", sh)
per = sh.groupBy("shingle").agg(F.sort_array(F.collect_set("doc_id")).alias("ds")).where(F.size("ds") >= 2).where(F.size("ds") <= 20)
t("per_shingle", per)
t("full_q38", duplicate_passages(docs, n=8, min_shared=3, max_df=20))
print("shingle rows:", sh.count(), flush=True)
spark.stop()
