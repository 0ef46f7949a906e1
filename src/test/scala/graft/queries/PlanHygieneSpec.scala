package graft.queries

import graft.SparkSpec

/** Registry-wide plan hygiene: every registered query's physical plan is
  * checked for the two unconditional scale-killers. A CartesianProduct is
  * never acceptable. A BroadcastNestedLoopJoin is acceptable only when the
  * broadcast side is provably tiny by construction (a handful of query
  * points, a candidate list bounded by a sketch size, a 1-row aggregate
  * grid, or a deliberately-registered all-pairs baseline whose scale twin
  * is also registered) — that set is pinned here so any NEW query that
  * planner-drifts into a nested loop fails the suite instead of silently
  * shipping a 100 TB footgun.
  */
class PlanHygieneSpec extends SparkSpec {

  /** Queries whose plans legitimately contain a BroadcastNestedLoopJoin.
    * Each entry documents why the broadcast side stays small at any scale.
    */
  private val bnljWhitelist: Map[String, String] = Map(
    "b2_trend_gapfill" -> "hour grid x series keys: |hours| x |series| rows, both bounded",
    "c10_heavy_hitters" -> "Misra-Gries candidate list: at most k entries by sketch bound",
    "c18_knn_brute" -> "registered all-pairs baseline; scale twin c18_knn_agg",
    "c18_knn_agg" -> "broadcast query set: |Q| fixed and small by contract",
    "c18_radius_search" -> "broadcast query set: |Q| fixed and small by contract",
    "c17_embedding_neardup" -> "registered all-pairs baseline; scale twin c17_embedding_neardup_lsh",
    "c7_range_join" -> "broadcast band table: band count fixed by the band definition",
    "c7_interval_overlap" -> "broadcast interval baseline; scale twin c7_interval_bin_join",
    "pipeline_mix_balance" -> "broadcast per-language keep-rate grid: |languages| rows"
  )

  test("no registered query plans a CartesianProduct; BNLJ only where whitelisted") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    graft.Registry.defs.foreach { d =>
      val plan = d.fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct"))
        offenders += s"${d.name}: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljWhitelist.contains(d.name))
        offenders += s"${d.name}: unexpected BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty, s"plan hygiene violations:\n${offenders.mkString("\n")}")
  }

  test("the BNLJ whitelist is not stale: every entry still plans a BNLJ") {
    bnljWhitelist.keys.foreach { name =>
      val plan = graft.Registry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"),
        s"$name no longer plans a BNLJ — remove it from the whitelist")
    }
  }
}
