package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted co-partitioned PageRank layout: parity with the in-query
  * path, the zero-Exchange iteration join the layout exists to provide,
  * and the staleness contract. */
class PageRankLayoutSpec extends SparkSpec {

  test("from-layout ranks match the in-query pageRankRanks bit-for-bit") {
    val inQuery = Relational.pageRankRanks(
      Relational.coPurchaseEdges(spark, sf), iters = 3)
      .collect().map(r => r.get(0) -> r.getDouble(1)).toMap
    val fromLayout = PageRankLayout.fromLayoutRanks(spark, sf, iters = 3)
      .collect().map(r => r.get(0) -> r.getDouble(1)).toMap
    assert(fromLayout === inQuery)
  }

  test("iteration join over the layout runs with ZERO Exchange; the full " +
    "step's only Exchange is the inherent contribution shuffle") {
    PageRankLayout.ensureLayout(spark, sf)
    // the rank tables exist after any from-layout run; make it explicit
    PageRankLayout.fromLayoutRanks(spark, sf, iters = 1)
    val edges = spark.table(PageRankLayout.edgesTable(sf))
    val nodes = spark.table(PageRankLayout.nodesTable(sf))
    val rank = spark.table(PageRankLayout.rankTable(sf, "b"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the per-iteration rank join: both sides scan bucketed tables —
      // no shuffle, no broadcast
      val j = edges.join(rank.hint("shuffle_hash"), col("id") === col("src"))
      j.collect()
      val jPlan = j.queryExecution.executedPlan.toString
      assert(!jPlan.contains("Exchange"),
        s"expected Exchange-free bucketed rank join:\n$jPlan")
      // the whole step: exactly one shuffle — the contribution aggregate
      // re-keying by dst (inherent to rank propagation), nothing else
      val cnt = spark.read.parquet(s"${PageRankLayout.layoutRoot(sf)}/meta")
        .head().getLong(1)
      val step = Relational.pageRankStep(edges, nodes, cnt, rank)
      step.collect()
      // AQE's toString prints the initial plan after the final one — count
      // shuffles in the FINAL (executed) section only
      val sPlan = step.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!sPlan.contains("BroadcastExchange"),
        s"rank must never broadcast:\n$sPlan")
      val shuffles = "Exchange hashpartitioning".r.findAllIn(sPlan).size
      assert(shuffles === 1,
        s"expected exactly the contribution shuffle, got $shuffles:\n$sPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("stale layout (corpus fingerprint mismatch) is rebuilt, fresh one reused") {
    PageRankLayout.ensureLayout(spark, sf)
    val root = PageRankLayout.layoutRoot(sf)
    def edgeFiles: Set[String] =
      new java.io.File(s"$root/edges").listFiles().map(_.getName).toSet
    def metaCount: Long = spark.read.parquet(s"$root/meta").head().getLong(0)
    val before = edgeFiles
    // fresh: ensure is a no-op on the files
    PageRankLayout.ensureLayout(spark, sf)
    assert(edgeFiles === before)
    // tamper the fingerprint: ensure must rebuild and restore it
    val meta = spark.read.parquet(s"$root/meta").collect().head
    import spark.implicits._
    Seq((meta.getLong(0) + 1L, meta.getLong(1), meta.getInt(2)))
      .toDF("lineitem_count", "node_count", "buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
    val live = graft.Tables.lineitem(spark, sf).count()
    assert(metaCount !== live)
    PageRankLayout.ensureLayout(spark, sf)
    assert(metaCount === live, "stale layout was not rebuilt")
  }
}
