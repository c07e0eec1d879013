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
from gelly_streaming_spark.ext.text import doc_shingles, tokenize
docs = load_table(spark, sf_dir, "documents")
docs.write.mode("overwrite").format("noop").save()
n = 8
C = 65536
tok = docs.select(F.col("doc_id"), F.posexplode(tokenize(F.col("text"))).alias("pos","token"))
c = F.lit(C)
home = F.floor(F.col("pos")/c).cast("int")
targets = F.when((F.col("pos")%c < n-1)&(F.col("pos")>=c), F.array(home, home-1)).otherwise(F.array(home))
tok2 = tok.select("doc_id","pos","token",F.explode(targets).alias("_chunk"))
agg = tok2.groupBy("doc_id","_chunk").agg(F.array_sort(F.collect_list(F.struct("pos","token"))).alias("pt"))
# materialized agg output: transform over it is safe from re-inlining
sh_alt = agg.select(
    "doc_id",
    F.explode(F.expr(
        f"transform(sequence(1, greatest(size(pt) - {n-1}, 0)), "
        f"i -> struct(pt[i-1].pos as spos, "
        f"xxhash64(concat_ws(' ', transform(slice(pt, i, {n}), s -> s.token))) as shingle))"
    )).alias("s"),
    F.col("_chunk"),
).where(F.floor(F.col("s.spos")/c).cast("int") == F.col("_chunk")).select("doc_id", F.col("s.shingle").alias("shingle"))
for r in range(3):
    t0=time.time(); sh_alt.write.mode("overwrite").format("noop").save(); print(f"alt run{r}: {time.time()-t0:.2f}", flush=True)
# equality check vs current
cur = doc_shingles(docs, n, hashed=True)
a = cur.groupBy("doc_id","shingle").count().orderBy("doc_id","shingle")
bb = sh_alt.groupBy("doc_id","shingle").count().orderBy("doc_id","shingle")
print("equal:", a.exceptAll(bb).count()==0 and bb.exceptAll(a).count()==0, flush=True)
spark.stop()
