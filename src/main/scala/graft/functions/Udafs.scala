package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}

/** C20 — user-extension surface: a typed Aggregator (UDAF) with exact
  * integer arithmetic so its result is bit-reproducible on any engine.
  *
  * WeightedMean accumulates (value_cents × weight, weight) in Longs —
  * order-independent, overflow-safe to ~9e18 — and divides once in double
  * at finish. This is the pattern for every custom aggregate at 100 TB:
  * exact associative accumulation, float only at the very end.
  */
object Udafs {

  /** Input: (cents, weight). Buffer: (Σ cents·w, Σ w). Output: weighted mean
    * in currency units. */
  object WeightedMean extends Aggregator[(Long, Long), (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), in: (Long, Long)): (Long, Long) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Long, Long)): Double =
      (r._1.toDouble / 100.0) / r._2.toDouble
    override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Quantity-weighted average extended price per return flag, via the
    * registered UDAF. Oracle replicates the exact integer arithmetic. */
  val udafWeightedPrice: QueryDef = QueryDef(
    "c20_udaf_weighted_price", "C20",
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE)
      |    / 100.0 / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS w_avg_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val wavg = udaf(WeightedMean)
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(wavg(
        round(col("l_extendedprice") * 100).cast(LongType),
        col("l_quantity").cast(LongType)).as("w_avg_price"))
      .orderBy("l_returnflag")
  }

  val all: Seq[QueryDef] = Seq(udafWeightedPrice)
}
