"""Count Spark jobs run by each query — a host-noise-immune measure of
driver job round-trips. Usage: count_jobs.py <repo_path> query [query...]"""
import os, sys

repo = sys.argv[1]
names = sys.argv[2:]
sys.path.insert(0, repo)
os.chdir(repo)

from se_data_pipeline_spark.session import get_spark
spark = get_spark("count_jobs")
sc = spark.sparkContext
from se_data_pipeline_spark.queries import all_queries
qs = all_queries()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark.range(2_000_000).selectExpr("sum(id % 97) AS s").toPandas()

for name in names:
    sc.setJobGroup(f"grp_{name}", name)
    qs[name](spark, sf_dir).toPandas()
    sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup(f"grp_{name}")
    print(f"{name}: jobs={len(jobs)}", flush=True)
