import os, sys, time, json
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS","32")
from machine_downtime_monitor_on_aws_spark.session import get_spark, unpersist_all_rdds
from machine_downtime_monitor_on_aws_spark.plans.textops import _docs, _PMI_MIN_COUNT, _PMI_TOPK
from machine_downtime_monitor_on_aws_spark.functions.text import tokens
from machine_downtime_monitor_on_aws_spark.streaming.store import _tracked_local_checkpoint
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
spark = get_spark("pmi_ab")

def build(mode):
    d = _docs(spark, SF)
    toked = d.select("doc_id", tokens(F.col("text")).alias("__toks"))
    uni = (toked.select(F.explode("__toks").alias("tok"))
           .groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    if mode == "lazy": uni = _tracked_local_checkpoint(uni, eager=False)
    elif mode == "eager": uni = _tracked_local_checkpoint(uni)
    big = toked.filter(F.size("__toks") >= 2)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("__toks") - F.lit(1)),
        lambda i: F.concat_ws(" ", F.element_at(F.col("__toks"), i),
                              F.element_at(F.col("__toks"), i + F.lit(1))))
    bi_all = (big.select(F.explode(bigrams).alias("bigram"))
              .groupBy("bigram").agg(F.count(F.lit(1)).alias("pair_count")))
    if mode == "lazy": bi_all = _tracked_local_checkpoint(bi_all, eager=False)
    elif mode == "eager": bi_all = _tracked_local_checkpoint(bi_all)
    bi = bi_all.filter(F.col("pair_count") >= _PMI_MIN_COUNT)
    nu = uni.agg(F.sum("c").alias("n_uni"))
    nb = bi_all.agg(F.sum("pair_count").alias("n_bi"))
    w = F.split(F.col("bigram"), " ")
    scored = (bi.withColumn("w1", w.getItem(0)).withColumn("w2", w.getItem(1))
        .join(uni.selectExpr("tok AS w1", "c AS c1"), "w1")
        .join(uni.selectExpr("tok AS w2", "c AS c2"), "w2")
        .crossJoin(F.broadcast(nu)).crossJoin(F.broadcast(nb))
        .select("bigram", "pair_count",
            (F.col("pair_count").cast("double") / F.col("n_bi").cast("double")
             / ((F.col("c1").cast("double") / F.col("n_uni").cast("double"))
                * (F.col("c2").cast("double") / F.col("n_uni").cast("double")))
            ).alias("pmi_ratio")))
    return scored.orderBy(F.col("pmi_ratio").desc(), F.col("bigram").asc()).limit(_PMI_TOPK)

# warmup both shapes
for m in ("none","lazy","eager"):
    build(m).count(); spark.catalog.clearCache(); unpersist_all_rdds(spark)
res = {m: [] for m in ("none","lazy","eager")}
import itertools
order = ["none","lazy","eager","eager","lazy","none","lazy","none","eager","none","eager","lazy"]
for m in order:
    sc = spark.sparkContext
    sc.setJobGroup(f"pmi_{m}_{len(res[m])}", m)
    t0 = time.perf_counter()
    build(m).count()
    dt = time.perf_counter() - t0
    st = sc.statusTracker(); jids = st.getJobIdsForGroup(f"pmi_{m}_{len(res[m])}")
    ntasks = sum(si.numTasks for j in jids if (ji := st.getJobInfo(j)) for s in ji.stageIds if (si := st.getStageInfo(s)))
    res[m].append((round(dt,3), len(jids), ntasks))
    sc.setJobGroup("","")
    spark.catalog.clearCache(); unpersist_all_rdds(spark)
print(json.dumps(res))
spark.stop()
