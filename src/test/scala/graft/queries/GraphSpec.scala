package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the iterative graph surface (C14 PageRank; connected
  * components is pinned in DedupSpec). */
class GraphSpec extends SparkSpec {

  test("pagerank on a path graph: symmetric ends, center dominates, mass conserved") {
    import spark.implicits._
    // undirected path a—b—c as directed multi-edges
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val r = Relational.pageRankRanks(edges, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) === r(3L)) // symmetry
    assert(r(2L) > r(1L))   // the cut vertex collects rank
    // teleport + no dangling nodes conserve total mass (up to the 1e-9
    // per-iteration snaps)
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }

  test("registered pagerank: mass conserved, every rank at least the teleport floor") {
    val rows = Relational.c14PageRank.fn(spark, sf).collect()
    val n = rows.length
    assert(n > 0)
    val ranks = rows.map(_.getDouble(1))
    assert(math.abs(ranks.sum - 1.0) < 1e-4) // n * 1e-9 snap error bound
    assert(ranks.forall(_ >= 0.15 / n - 1e-9))
  }
}
