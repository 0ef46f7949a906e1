package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.{QueryDef, Tables}

/** Persisted co-partitioned edge layout for PageRank — the build-once /
  * query-many split for the iterative graph surface, mirroring the
  * persisted ANN index ([[graft.similarity.Similarity.buildAnnIndex]]).
  *
  * `c14_pagerank` regenerates the co-purchase edge list (the lineitem pair
  * self-join — the query's most expensive stage) and re-caches it inside
  * EVERY execution. At 100 TB the edge list is a maintained table: built
  * once per corpus snapshot, stored CLUSTERED BY the join key, and
  * amortized over every downstream traversal. This object persists exactly
  * that layout:
  *
  *  - `edges` (src, dst, wn) — transition weights normalized at build,
  *    BUCKETED BY src: a scan reports HashPartitioning(src, buckets), so
  *    the per-iteration rank join needs no Exchange on the edge side — or
  *    on the rank side either, because each iteration's rank vector is
  *    itself written bucketed by id into the same bucket count (the write
  *    doubles as the iteration's materialization barrier, replacing the
  *    localCheckpoint of the in-query path — and unlike a local
  *    checkpoint it is restart-safe on a real cluster). The ONLY Exchange
  *    in an iteration is the inherent contribution shuffle by dst
  *    (asserted in PageRankLayoutSpec).
  *  - `nodes` (id) — bucketed by id for the dangling-default left join.
  *  - `meta` (lineitem_count, node_count, buckets) — the staleness
  *    fingerprint: a stored layout is trusted only while the live corpus
  *    row count matches, so a changed corpus can never be served a stale
  *    graph (same contract as the ANN index meta row).
  *
  * Arithmetic parity: the build runs the SAME normalization pipeline as
  * [[Relational.pageRankRanks]] (sum of exact small-integer doubles, one
  * w/tw division) and the query path iterates with the SAME
  * [[Relational.pageRankStep]], so ranks land on the identical 1e-9 grid
  * and `c14_pagerank_from_layout` shares `c14_pagerank`'s DuckDB oracle
  * VERBATIM — the driver compare doubles as the layout/in-query parity
  * gate.
  *
  * On-disk root lives under java.io.tmpdir keyed by the (sanitized) corpus
  * path; on a real cluster this would be a warehouse/object-store URI —
  * the layout (bucketed parquet + a catalog declaration) is identical
  * either way. Table declarations are per-session (in-memory catalog):
  * [[ensureLayout]] re-declares external bucketed tables over the stored
  * files when a fresh JVM finds them undeclared.
  */
object PageRankLayout {

  private def tag(dataDir: String): String =
    dataDir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase

  def layoutRoot(dataDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_pr_layout/${tag(dataDir)}"

  private[graft] def edgesTable(dataDir: String): String = s"graft_pr_edges_${tag(dataDir)}"
  private[graft] def nodesTable(dataDir: String): String = s"graft_pr_nodes_${tag(dataDir)}"
  private[graft] def rankTable(dataDir: String, side: String): String =
    s"graft_pr_rank_${side}_${tag(dataDir)}"

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  /** Drop any stale declaration, clear the location, write `df` bucketed
    * (and per-file sorted) by `key` as an EXTERNAL parquet table at `loc`.
    * Inputs already hash-partitioned on `key` with the same count land one
    * file per bucket (bucketBy uses the same Murmur3 pmod as shuffle
    * HashPartitioning), so the layout stays one-file-per-bucket. */
  private def writeBucketed(spark: SparkSession, df: DataFrame, table: String,
      loc: String, key: String, buckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    deleteRecursively(new java.io.File(loc))
    df.write.format("parquet").option("path", loc)
      .bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(table)
  }

  /** Re-declare an external bucketed table over already-written files —
    * the fresh-JVM path: files persist across sessions, the in-memory
    * catalog does not. Bucket metadata lives in the declaration, so the
    * DDL must repeat the layout the files were written with. */
  private def declare(spark: SparkSession, table: String, loc: String,
      key: String, buckets: Int): Unit =
    if (!spark.catalog.tableExists(table)) {
      val ddl = spark.read.parquet(loc).schema.toDDL
      spark.sql(s"CREATE TABLE $table ($ddl) USING PARQUET " +
        s"CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS " +
        s"LOCATION '$loc'")
    }

  /** One corpus-sized build pass — the cost a 100 TB deployment pays once
    * per corpus snapshot: pair self-join → per-(src,dst) weight sum →
    * out-weight normalization (bit-identical arithmetic to
    * [[Relational.pageRankRanks]]'s in-query materialization; all sums are
    * exact small integers in double, so grouping order cannot perturb wn),
    * then ONE bucketed write per table. */
  def buildLayout(spark: SparkSession, dataDir: String): Unit = {
    val root = layoutRoot(dataDir)
    val np = spark.sessionState.conf.numShufflePartitions
    val raw = Relational.coPurchaseEdges(spark, dataDir)
    val edges = raw.repartition(np, col("src"))
      .groupBy("src", "dst")
      .agg(sum(col("w").cast(DoubleType)).as("w"))
    val outw = edges.groupBy("src").agg(sum(col("w")).as("tw"))
    val edgesN = edges.join(outw.hint("shuffle_hash"), Seq("src"))
      .select(col("src"), col("dst"), (col("w") / col("tw")).as("wn"))
    val nodes = edgesN.select(col("src").as("id")).distinct()
    writeBucketed(spark, edgesN, edgesTable(dataDir), s"$root/edges", "src", np)
    writeBucketed(spark, nodes, nodesTable(dataDir), s"$root/nodes", "id", np)
    val liCount = Tables.lineitem(spark, dataDir).count()
    val nodeCount = spark.table(nodesTable(dataDir)).count()
    import spark.implicits._
    Seq((liCount, nodeCount, np)).toDF("lineitem_count", "node_count", "buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
  }

  /** Trust a stored layout only while its fingerprint matches the live
    * corpus (parquet-metadata-cheap row count); otherwise rebuild. Always
    * leaves this session's catalog holding the table declarations. */
  def ensureLayout(spark: SparkSession, dataDir: String): Unit = {
    val root = layoutRoot(dataDir)
    val fresh =
      try {
        val m = spark.read.parquet(s"$root/meta").head()
        m.getLong(0) == Tables.lineitem(spark, dataDir).count()
      } catch { case _: Exception => false }
    if (!fresh) buildLayout(spark, dataDir)
    else {
      val buckets = spark.read.parquet(s"$root/meta").head().getInt(2)
      declare(spark, edgesTable(dataDir), s"$root/edges", "src", buckets)
      declare(spark, nodesTable(dataDir), s"$root/nodes", "id", buckets)
    }
  }

  /** Write one iteration's rank vector bucketed by id — the zero-Exchange
    * join feed AND the iteration's materialization barrier. */
  private[graft] def writeRank(spark: SparkSession, r: DataFrame,
      dataDir: String, side: String, buckets: Int): Unit =
    writeBucketed(spark, r, rankTable(dataDir, side),
      s"${layoutRoot(dataDir)}/rank_$side", "id", buckets)

  /** PageRank answered FROM the persisted layout — the query-many hot
    * path. Corpus-sized inputs touched per iteration: the bucketed edge
    * scan (no pair self-join, no cache build) and the contribution
    * shuffle by dst (inherent to rank propagation). The per-iteration
    * joins are Exchange-free: edges, nodes and the rank vector all scan
    * with the layout's HashPartitioning. Ranks alternate between two
    * bucketed tables (a write never reads its own target). */
  def fromLayoutRanks(spark: SparkSession, dataDir: String, iters: Int = 3): DataFrame = {
    ensureLayout(spark, dataDir)
    val root = layoutRoot(dataDir)
    val meta = spark.read.parquet(s"$root/meta").head()
    val cnt = meta.getLong(1)
    val buckets = meta.getInt(2)
    val edgesN = spark.table(edgesTable(dataDir))
    val nodes = spark.table(nodesTable(dataDir))
    // r0: the same driver-side teleport literal arithmetic as pageRankRanks
    writeRank(spark, nodes.select(col("id"), round(lit(1.0 / cnt), 9).as("r")),
      dataDir, "a", buckets)
    var cur = "a"
    for (_ <- 1 to iters) {
      val next = Relational.pageRankStep(edgesN, nodes, cnt,
        spark.table(rankTable(dataDir, cur)))
      val nx = if (cur == "a") "b" else "a"
      writeRank(spark, next, dataDir, nx, buckets)
      cur = nx
    }
    spark.table(rankTable(dataDir, cur))
  }

  /** Layout build as a registered, full-oracle query: builds + persists
    * the bucketed edge layout, then returns the PERSISTED edge table read
    * back from the store — the driver's hash compare checks the stored
    * artifact itself (src, dst, wn) against the oracle's normalization.
    * wn = w/tw divides two exact small integers held in double, so the
    * stored floats are bit-deterministic on both engines. */
  val pageRankLayoutBuild: QueryDef = QueryDef(
    "c14_pagerank_layout_build", "C14",
    """WITH e0 AS (
      |  SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS w
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2),
      |edges AS (SELECT src, dst, w FROM e0
      |          UNION ALL SELECT dst, src, w FROM e0),
      |outw AS (SELECT src, sum(w) AS tw FROM edges GROUP BY src)
      |SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / CAST(o.tw AS DOUBLE) AS wn
      |FROM edges e JOIN outw o ON o.src = e.src
      |ORDER BY e.src, e.dst""".stripMargin) { (s, d) =>
    buildLayout(s, d)
    s.table(edgesTable(d)).orderBy("src", "dst")
  }

  /** PageRank from the persisted layout ([[fromLayoutRanks]]) — same
    * rounds, same step arithmetic, same oracle VERBATIM as
    * `c14_pagerank`: the driver compare doubles as the build/query-split
    * parity gate. First execution against a corpus builds the layout
    * ([[ensureLayout]]); every subsequent execution iterates over the
    * stored bucketed tables alone — no pair self-join, no cache build. */
  val pageRankFromLayout: QueryDef = QueryDef(
    "c14_pagerank_from_layout", "C14 C9",
    Relational.c14PageRank.oracle.get) { (s, d) =>
    fromLayoutRanks(s, d, iters = 3)
      .select(col("id").as("part_id"), col("r").as("rank")).orderBy("part_id")
  }

  val all: Seq[QueryDef] = Seq(pageRankLayoutBuild, pageRankFromLayout)
}
