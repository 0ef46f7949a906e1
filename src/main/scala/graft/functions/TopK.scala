package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator for (score, id) pairs: keeps the k highest
  * scores (ties broken by lower id), ordered descending.
  *
  * Scale rationale: the window-function top-k (`row_number() over
  * (partition by q)`) shuffles EVERY scored pair to the query's reducer;
  * this aggregator combines map-side, so at most k pairs per query per
  * input partition cross the wire — at a 100 TB corpus that's the
  * difference between shuffling |corpus| rows and shuffling
  * partitions × k rows per query.
  *
  * Deterministic: the (score desc, id asc) order is total, so the result
  * is independent of partitioning and merge order.
  */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    ((buf :+ in).sorted(ord)).take(k)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    ((a ++ b).sorted(ord)).take(k)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r.sorted(ord)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}
