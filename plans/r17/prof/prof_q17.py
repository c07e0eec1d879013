import os, sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import SparkSession
from gelly_streaming_spark.blas import blas_env
from gelly_streaming_spark.session import BUILD_CONFS, RUNTIME_CONFS
os.environ.update(blas_env(1))
b = SparkSession.builder.appName("prof").master("local[32]")
for k, v in {**BUILD_CONFS, **RUNTIME_CONFS}.items():
    b = b.config(k, v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"
from gelly_streaming_spark.sources.edges import copart_canonical
t0=time.time(); e = copart_canonical(spark, sf_dir); e.write.mode("overwrite").format("noop").save(); print(f"copart {time.time()-t0:.2f}")

from gelly_streaming_spark.plans.probe import bounded_take
t0=time.time(); tbl = bounded_take(e.select("src","dst"), 5_000_000, as_arrow=True); print(f"bounded_take {time.time()-t0:.2f} rows={tbl.num_rows}")

import numpy as np
from gelly_streaming_spark.algos.triangles import _tri_prep, _tri_prep_spark
src = tbl["src"].to_numpy().astype(np.int64); dst = tbl["dst"].to_numpy().astype(np.int64)
t0=time.time(); p_driver = _tri_prep(src, dst); print(f"_tri_prep(driver) {time.time()-t0:.2f}")
t0=time.time(); p_spark = _tri_prep_spark(e.select("src","dst"), tbl); print(f"_tri_prep_spark {time.time()-t0:.2f}")
print("equal:", all((np.array_equal(a,b) if isinstance(a,np.ndarray) else a==b) for a,b in zip(p_driver, p_spark)))
t0=time.time(); bc = spark.sparkContext.broadcast(p_spark); print(f"broadcast {time.time()-t0:.2f}")
# slice stage
from gelly_streaming_spark.algos.triangles import _tri_count_slice
import pandas as pd
nparts = max(1, min(2*spark.sparkContext.defaultParallelism, tbl.num_rows//20_000+1))
print("nparts:", nparts)
def count_slices(batches):
    from gelly_streaming_spark.blas import pin_blas_threads
    pin_blas_threads()
    p = bc.value
    for pdf in batches:
        t = sum(_tri_count_slice(*p, part=int(i), nparts=nparts) for i in pdf["id"])
        yield pd.DataFrame({"tri":[t]})
for r in range(3):
    t0=time.time()
    per = spark.range(0, nparts, 1, nparts).mapInPandas(count_slices, "tri long")
    import pyspark.sql.functions as F
    per.groupBy().agg(F.sum("tri")).write.mode("overwrite").format("noop").save()
    print(f"slice_stage run{r} {time.time()-t0:.2f}")
# driver-only full count timing
t0=time.time(); tot = _tri_count_slice(*p_driver); print(f"driver_full_count {time.time()-t0:.2f} tri={tot}")
spark.stop()
