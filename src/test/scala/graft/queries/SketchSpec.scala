package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C10 sketch invariants: the merge property that justifies sketches at
  * scale — building per-partition sketches and unioning them must equal
  * sketching the whole corpus directly (HLL registers are maxima, so union
  * is exact and order-independent), and the estimate must land near the
  * exact distinct count. */
class SketchSpec extends SparkSpec {

  test("per-type HLL sketches union to the same estimate as one direct sketch") {
    val ev = graft.Tables.events(spark, sf)
    val merged = Relational.c10HllMerge.fn(spark, sf)
      .where(col("event_type") === "ALL")
      .collect().head.getLong(1)
    val direct = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).cast("long"))
      .collect().head.getLong(0)
    assert(merged === direct)
  }

  test("HLL estimates are within 5% of exact distinct counts, per group and overall") {
    val ev = graft.Tables.events(spark, sf)
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = ev.select(countDistinct(col("user_id"))).collect().head.getLong(0)
    val approx = Relational.c10HllMerge.fn(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (exact + ("ALL" -> exactAll)).foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1L, (0.05 * n).toLong),
        s"$k: approx ${approx(k)} vs exact $n")
    }
  }
}
