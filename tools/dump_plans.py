import sys, os
sys.path.insert(0, os.environ.get("SPARK_GRAFT_REPO", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from fxa_amplitude_send_spark.session import build_session
from fxa_amplitude_send_spark.plans import all_queries

names = sys.argv[1].split(",")
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plans"
os.makedirs(out_dir, exist_ok=True)
spark = build_session("plans"); spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()
for n in names:
    try:
        df = qs[n](spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
        p = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        with open(os.path.join(out_dir, n + ".txt"), "w") as fh:
            fh.write(p)
        import re
        nex = len(re.findall(r"Exchange", p))
        print(n, "exchanges:", nex, "scans:", len(re.findall(r"Scan parquet", p)),
              "python:", len(re.findall(r"EvalPython|MapInPandas|FlatMapGroupsInPandas|Cogroup", p)))
    except Exception as e:
        print(n, "ERR", str(e)[:100])
