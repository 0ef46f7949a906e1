package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra–Gries sketch guarantees on adversarial planted streams. */
class MisraGriesSpec extends SparkSpec {

  test("sketch retains every key above N/(cap+1) across many partitions") {
    import spark.implicits._
    // 3 heavy keys at ~10% each + 700 singleton keys; cap 16 guarantees
    // retention above N/17 ≈ 5.9% — the singletons must never evict a
    // heavy key, whatever the partition layout.
    val heavy = Seq.fill(100)(1L) ++ Seq.fill(100)(2L) ++ Seq.fill(100)(3L)
    val noise = (1000L until 1700L)
    val stream = spark.sparkContext
      .parallelize(scala.util.Random.shuffle(heavy ++ noise), 13).toDF("key")
    val mg = udaf(new MisraGries(16))
    val cands = stream.agg(mg(col("key")))
      .head().getSeq[Long](0).toSet
    assert(cands.size <= 16)
    assert(Set(1L, 2L, 3L).subsetOf(cands))
  }

  test("candidate recount matches the exact group-by on the registered query") {
    // the composed operator (sketch prune -> exact recount -> threshold)
    // must equal the sketch-free plan
    val out = graft.queries.Relational.c10HeavyHitters.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val keyed = graft.Tables.events(spark, sf).select(
      when(col("user_id") % 3 === 0, col("user_id") % 7)
        .otherwise(col("user_id")).as("key"))
    val n = keyed.count()
    val exact = keyed.groupBy("key").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * 64 > n)
      .orderBy(desc("cnt"), col("key"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === exact)
    assert(out.nonEmpty) // the planted skew is actually detected
  }
}
