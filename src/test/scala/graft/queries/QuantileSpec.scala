package graft.queries

import graft.SparkSpec

/** C9 quantiles: the exact query is oracle-checked by the driver; here the
  * sketch twin (approx_percentile) is pinned to land near the exact
  * interpolated values — the contract that makes it a usable stand-in at
  * scale. */
class QuantileSpec extends SparkSpec {

  test("approx_percentile tracks the exact per-group percentiles") {
    val exact = Relational.c9Quantiles.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val approx = Relational.c9QuantilesApprox.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, (q50, q90, p25)) =>
      val (e50, e90, e25) = exact(k)
      // l_quantity is integer-valued in [1, 50]: the sketch returns a real
      // data point within a couple of ranks of the interpolated exact value
      assert(math.abs(q50 - e50) <= 2.0, s"$k qty_p50 $q50 vs $e50")
      assert(math.abs(q90 - e90) <= 2.0, s"$k qty_p90 $q90 vs $e90")
      // price is continuous: 2% relative envelope
      assert(math.abs(p25 - e25) <= 0.02 * e25, s"$k price_p25 $p25 vs $e25")
    }
  }
}
