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

  /** C20 scalar UDF example — deliberately trivial (band label from a
    * price). Kept OUT of hot paths: a scalar udf blocks codegen and
    * vectorization; the native-Expression route (CosineSim etc.) is the
    * performance path, this is the user-extension escape hatch. */
  val priceBand = org.apache.spark.sql.functions.udf { (price: Double) =>
    if (price < 950.0) "low" else "high"
  }

  /** C20 UDTF-shaped extension: one row per n-gram via explode over a
    * generator expression — the Spark-idiomatic table function. */
  val udtfNgrams: QueryDef = QueryDef(
    "c20_udtf_ngrams", "C20",
    """SELECT p_partkey,
      |  unnest(regexp_split_to_array(trim(p_name), '\s+')) AS gram
      |FROM part WHERE p_partkey < 100 ORDER BY p_partkey, gram""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .where(col("p_partkey") < 100)
      .select(col("p_partkey"),
        explode(split(trim(col("p_name")), "\\s+")).as("gram"))
      .orderBy("p_partkey", "gram")
  }

  /** C20 scalar-udf query. The udf body is arbitrary user code from
    * Spark's perspective (opaque, blocks codegen); this particular body is
    * simple enough to mirror in SQL, so the oracle still checks it. */
  val udfBand: QueryDef = QueryDef(
    "c20_udf_price_band", "C20",
    """SELECT p_partkey,
      |  CASE WHEN p_retailprice < 950.0 THEN 'low' ELSE 'high' END AS band
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"), priceBand(col("p_retailprice")).as("band"))
      .orderBy("p_partkey")
  }

  val all: Seq[QueryDef] = Seq(udafWeightedPrice, udtfNgrams, udfBand)
}
