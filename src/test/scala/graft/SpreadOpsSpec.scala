package graft

import org.apache.spark.sql.functions._

import graft.Tables.SpreadOps

/** Pins the [[Tables.SpreadOps.spreadByKey]] contract (round-14 verdict
  * directive 5): the spread partition count follows the session's
  * defaultParallelism — CPU-optimal at any core count — and survives AQE
  * (an explicit-count repartition is one AQE's coalescing must respect;
  * the whole point of the helper). The byte-sizing HALF of the contract
  * (small-bytes inputs only; zero spill measured at 4× per-partition
  * bytes under local[8] at sf1) is a measured property recorded in the
  * scaladoc and SCALECHECK.md — re-measure via
  * `SPARK_GRAFT_CPUS=8 SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_BENCH_ONLY=...`
  * if the call-site set changes. */
class SpreadOpsSpec extends SparkSpec {

  test("spreadByKey produces exactly defaultParallelism partitions, AQE on") {
    val n = spark.sparkContext.defaultParallelism
    val df = Tables.documents(spark, sf).spreadByKey(col("doc_id"))
    // count AFTER execution with AQE enabled: the explicit count must not
    // be coalesced the way a bare repartition(col) would be
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") === "true")
    val parts = df.rdd.getNumPartitions
    assert(parts === n, s"spreadByKey produced $parts partitions, expected $n")
    // rows survive intact (repartition is a pure exchange)
    assert(df.count() === Tables.documents(spark, sf).count())
  }

  test("spreadByKey co-locates equal keys (it is a hash repartition, not round-robin)") {
    import spark.implicits._
    val df = Seq.tabulate(64)(i => (i.toLong % 4, i.toLong)).toDF("k", "v")
      .spreadByKey(col("k"))
    val placements = df.select(col("k"), spark_partition_id().as("p"))
      .distinct().collect().map(r => (r.getLong(0), r.getInt(1)))
    // each key lives in exactly one partition — the property dedup's
    // downstream per-key aggregations rely on to avoid a second shuffle
    assert(placements.groupBy(_._1).forall(_._2.length == 1))
  }
}
