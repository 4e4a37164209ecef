import sys, time, json
sys.path.insert(0,'/root/repo')
from ucuddle_search_engine_spark.session import get_spark
from ucuddle_search_engine_spark.plans.build_index import build_index_resumable
spark = get_spark("build5m_dbg", cores=32, shuffle_partitions=64, extra_conf={
  "spark.python.worker.faulthandler.enabled":"true",
  "spark.sql.execution.pyspark.udf.faulthandler.enabled":"true"})
corpus = spark.read.parquet("/root/repo/.data/corpus_5000000")
t0=time.time()
stats = build_index_resumable(spark, corpus, "/root/repo/.data/store_5m", n_units=8, num_shards="auto", write_postings=True)
wall=round(time.time()-t0,1)
print("BUILD_OK", wall, stats.get("crashed"), flush=True)
json.dump({"wall_s": wall}, open("/root/repo/.data/store_5m/build_stats.json","w"))
