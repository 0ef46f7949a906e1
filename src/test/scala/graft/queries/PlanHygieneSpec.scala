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

  /** Queries whose plans legitimately contain a BroadcastNestedLoopJoin
    * because the broadcast side is provably tiny BY CONSTRUCTION at any
    * scale (these are NOT baselines — they are the 100 TB path).
    * Deliberate non-scale baselines are not listed here: they carry a
    * `QueryDef.baseline` tag at their definition site, and the effective
    * whitelist below is derived from those tags. */
  private val boundedBroadcast: Map[String, String] = Map(
    "b2_trend_gapfill" -> "hour grid x series keys: |hours| x |series| rows, both bounded",
    "b2_gap_detect" -> "hour grid x series keys: |hours| x |series| rows, both bounded",
    "b2_trend_interpolate" -> "hour grid x series keys: |hours| x |series| rows, both bounded",
    "c10_heavy_hitters" -> "Misra-Gries candidate list: at most k entries by sketch bound",
    "c18_knn_agg" -> "broadcast query set: |Q| fixed and small by contract",
    "c18_radius_search" -> "broadcast query set: |Q| fixed and small by contract",
    "c7_range_join" -> "broadcast band table: band count fixed by the band definition",
    "c9_histogram" -> "broadcast min/max bounds: 1-row aggregate x fixed 16-bucket grid",
    "c19_tfidf_topterms" -> "broadcast corpus-size scalar: 1-row count aggregate",
    "c19_nb_classifier" -> "broadcast class list + vocab/corpus scalars: |classes| and 1-row aggregates",
    "c19_dsir_weights" -> "broadcast (n_target, n_raw, vocab) scalars: 1-row aggregate",
    "c19_bigram_ppl" -> "broadcast vocabulary-size scalar: 1-row aggregate",
    "pipeline_mix_balance" -> "broadcast per-language keep-rate grid: |languages| rows",
    "pipeline_importance_thin" -> "broadcast max-weight scalar: 1-row aggregate"
  )

  private def bnljWhitelist: Set[String] =
    boundedBroadcast.keySet ++
      graft.Registry.defs.filter(_.baseline.isDefined).map(_.name)

  test("no registered query plans a CartesianProduct; BNLJ only where whitelisted") {
    val whitelist = bnljWhitelist
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    graft.Registry.defs.foreach { d =>
      val plan = d.fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct"))
        offenders += s"${d.name}: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !whitelist.contains(d.name))
        offenders += s"${d.name}: unexpected BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty, s"plan hygiene violations:\n${offenders.mkString("\n")}")
  }

  test("the bounded-broadcast whitelist is not stale: every entry still plans a BNLJ") {
    // (baseline-tagged queries are exempted from the ban but not REQUIRED
    // to plan a BNLJ — e.g. c9_quantiles is a baseline by cost, not shape)
    boundedBroadcast.keys.foreach { name =>
      val plan = graft.Registry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"),
        s"$name no longer plans a BNLJ — remove it from the whitelist")
    }
  }

  test("every baseline tag names a registered scale twin") {
    val registered = graft.Registry.defs.map(_.name).toSet
    graft.Registry.defs.filter(_.baseline.isDefined).foreach { d =>
      val reason = d.baseline.get
      val named = registered.filter(t => t != d.name && reason.contains(t))
      assert(named.nonEmpty,
        s"${d.name}: baseline reason must name its registered scale twin; got '$reason'")
    }
  }
}
