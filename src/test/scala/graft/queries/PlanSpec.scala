package graft.queries

import graft.SparkSpec

/** Plan-shape assertions: the 100 TB design claims, checked against the
  * actual physical plans Catalyst produces (not just "it returns rows"). */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.Registry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("C3: dims are broadcast (BroadcastHashJoin, no shuffle join)") {
    val p = plan("c3_broadcast_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("C1: filter and column pruning reach the parquet scan") {
    val p = plan("c1_scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"))
    // pruned read schema: only the 4 selected columns
    assert(p.contains("l_orderkey") && !p.contains("l_extendedprice"))
  }

  test("C5: semi join stays a join, not a cartesian") {
    val p = plan("c5_semi_join")
    assert(p.contains("LeftSemi"))
    assert(!p.contains("CartesianProduct"))
  }

  test("C8: as-of join is one window pass, no nested-loop join") {
    val p = plan("c8_asof_join")
    assert(p.contains("Window"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("C13: global top-k uses TakeOrderedAndProject, not a full sort") {
    val p = plan("c13_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("C9: aggregate is partial+final hash aggregate") {
    val p = plan("c9_tpch_q1")
    assert(p.contains("HashAggregate"))
  }

  test("C4/C13 composed: TPC-H Q3/Q10 end in TakeOrderedAndProject, not a global sort") {
    for (q <- Seq("c4_tpch_q3", "c9_tpch_q10")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("C3 composed: TPC-H Q5's six-table join broadcasts the dims") {
    val p = plan("c3_tpch_q5")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("C9: retention cohort shuffles events once on user_id, join is agg-to-agg") {
    val p = plan("c9_retention_cohort")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // the raw events scan appears once; the cohort side reuses the distinct set
    assert(p.sliding("PushedFilters: [IsNotNull(event_type)".length)
      .count(_ == "PushedFilters: [IsNotNull(event_type)") <= 2)
  }

  test("pipeline: mix-balance rates join broadcast — the corpus is never shuffled") {
    val p = plan("pipeline_mix_balance")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"))
  }

  test("C7 scale path: binned range join is an equi-join, not nested-loop") {
    val p = plan("c7_range_bin_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("Join")) // hash/sort-merge equi-join on the bin key
  }

  test("C17 scale path: bucketed near-dup has no nested-loop join") {
    val p = plan("c17_embedding_neardup_lsh")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("C17: capped ngram jaccard joins stay equi-joins") {
    val p = plan("c17_ngram_jaccard")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("C4 skew path: salted join is an equi-join on (key, salt)") {
    val p = plan("c4_salted_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("_salt"))
  }

  test("curation pipeline: gates before the dedup shuffle, survivor semi-join, no cartesian") {
    val p = plan("pipeline_curate")
    assert(p.contains("LeftSemi"))
    assert(!p.contains("CartesianProduct") && !p.contains("Window"))
  }

  test("C18 scale path: IVF assignment is map-side, no corpus shuffle before the probe join") {
    val p = plan("c18_ann_ivf")
    // assignment = projection (nearest_centroids expression), probe join
    // broadcasts the tiny query side; the only Exchange is the bounded
    // top-k aggregation's — so exactly one shuffle plus the final sort's
    assert(p.contains("nearest_centroids"))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("C17 span dedup: postings equi-join machinery, no nested-loop, no all-pairs") {
    val p = plan("c17_span_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("HashAggregate")) // bounded postings + pair count aggs
  }

  test("C17 semantic dedup: assignment materialized once, pairs meet on cluster id, anti-join keep") {
    val p = plan("c17_semantic_dedup")
    // the map-side nearest_centroids assignment is computed once behind a
    // lazy localCheckpoint (so the pair join's two sides and the anti-join
    // all reuse it instead of recomputing the projection per branch) — the
    // visible plan therefore starts at the materialized RDD scan
    assert(p.contains("ExistingRDD"))       // checkpointed assignment, reused
    assert(p.contains("ShuffledHashJoin"))  // pairs meet partition-parallel on c_id
    assert(p.contains("LeftAnti"))          // drop-set application
    assert(!p.contains("CartesianProduct")) // never all-pairs
  }

  test("C18 radius search: threshold cut runs in the join filter, before any shuffle") {
    val p = plan("c18_radius_search")
    // tiny query side broadcast; the >= tau predicate lives in the join
    // condition/filter so survivors alone reach the output sort
    assert(p.contains("BroadcastNestedLoopJoin")) // deliberate: broadcast × theta
    assert(p.contains("cosine_sim") && p.contains("0.3"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("C7 scale path: interval bin join is an equi-join on the bin, not nested-loop") {
    val p = plan("c7_interval_bin_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("Join"))
  }

  test("C12 gaps-and-islands: both window passes collapse to one shuffle on user_id") {
    val p = plan("c12_gaps_islands")
    // lag-flag pass and running-sum pass share partitioning+ordering — the
    // plan must contain Window operators but only ONE exchange hashed on
    // user_id before them (the agg reuses the partitioning)
    assert(p.contains("Window"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected <= 2 hash exchanges, got $exchanges:\n$p")
  }

  test("pipeline: CDC merge is one shuffle join, full-outer, no nested loop") {
    val p = plan("pipeline_cdc_merge")
    assert(p.contains("FullOuter"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("pipeline: bloom probe filters the gram stream before the exact join") {
    val p = plan("pipeline_decontaminate_bloom")
    // the probe must sit on the scan side (a Filter containing the
    // expression), not after the join
    val filterIdx = p.indexOf("bloom_might_contain")
    assert(filterIdx >= 0, p.take(500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("C5 SQL surface: correlated EXISTS/NOT EXISTS de-correlate to semi/anti joins") {
    val p = plan("c5_exists_correlated")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("C10: heavy-hitter recount joins the candidate set broadcast, never shuffles events twice") {
    val p = plan("c10_heavy_hitters")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("C19: typicality frequency dictionary is broadcast back over the corpus") {
    val p = plan("c19_corpus_typicality")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("C9: funnel is equi-joins + hash aggregates, no inequality join") {
    val p = plan("c9_funnel")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("HashAggregate"))
  }

  test("pipeline: packing computes prefix sums per source partition, chunking stays narrow") {
    val p = plan("pipeline_pack")
    assert(p.contains("Window"))
    assert(p.contains("hashpartitioning(source")) // per-source, not single-reducer
    val c = plan("pipeline_chunk")
    // explode + project only; the sole Exchange is the deterministic-output
    // range sort, never a hash shuffle
    assert(c.contains("Generate") && !c.contains("hashpartitioning"))
  }

  test("whole-stage codegen covers the scan+project pipelines") {
    // AQE finalizes (and shows codegen spans) only after execution
    val df = graft.Registry.queries("c19_token_count")(spark, sf)
    df.collect()
    // codegen'd spans render as "*(n) Op" in the executed plan string
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"))
  }
}
