package graft.queries

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.{QueryDef, Tables}
import graft.util.CorpusFingerprint
import graft.util.CorpusFingerprint.Fp

/** Persisted co-partitioned edge layout for PageRank — the build-once /
  * query-many split for the iterative graph surface, mirroring the
  * persisted ANN index ([[graft.similarity.Similarity.buildAnnIndex]]).
  *
  * `c14_pagerank` regenerates the co-purchase edge list (the lineitem pair
  * self-join — the query's most expensive stage) and re-caches it inside
  * EVERY execution. At 100 TB the edge list is a maintained table: built
  * once per corpus snapshot, stored CLUSTERED BY the join key, amortized
  * over every downstream traversal, and — round 18 — maintained
  * INCREMENTALLY as order-complete batches append ([[appendLayout]]):
  * the hourly-ingest cadence the reference itself runs
  * (reference README.md:5). This object persists exactly that layout:
  *
  *  - `edges` (src, dst, w, wn) — raw summed pair weights w (kept so an
  *    appended batch's delta pairs can be aggregate-merged without
  *    re-deriving the old corpus) and transition weights wn normalized at
  *    build, BUCKETED BY src: a scan reports HashPartitioning(src,
  *    buckets), so the per-iteration rank join needs no Exchange on the
  *    edge side — or on the rank side either, because each iteration's
  *    rank vector is itself written bucketed by id into the same bucket
  *    count (the write doubles as the iteration's materialization
  *    barrier, replacing the localCheckpoint of the in-query path — and
  *    unlike a local checkpoint it is restart-safe on a real cluster).
  *    The ONLY Exchange in an iteration is the inherent contribution
  *    shuffle by dst (asserted in PageRankLayoutSpec).
  *  - `nodes` (id) — bucketed by id for the dangling-default left join.
  *  - `meta` (lineitem_count, node_count, buckets, fp_xor, fp_sum) — the
  *    staleness fingerprint: row count PLUS an order-independent content
  *    hash over the derivation columns (l_orderkey, l_partkey) — see
  *    [[graft.util.CorpusFingerprint]] — so neither a grown corpus NOR a
  *    same-count content change (upsert, compaction rewrite, one swapped
  *    edge) can be served a stale graph. Same contract as the ANN index
  *    meta row.
  *
  * Arithmetic parity: the build runs the SAME normalization pipeline as
  * [[Relational.pageRankRanks]] (sum of exact small-integer doubles, one
  * w/tw division) and the query path iterates with the SAME
  * [[Relational.pageRankStep]], so ranks land on the identical 1e-9 grid
  * and `c14_pagerank_from_layout` shares `c14_pagerank`'s DuckDB oracle
  * VERBATIM — the driver compare doubles as the layout/in-query parity
  * gate. Boundary caveat: the per-dst float sum inside a step is taken
  * under different physical partitionings on the two paths, so a sum
  * landing within 0.5e-9 of a rounding-grid boundary could in principle
  * round apart; every corpus gated so far (sf0.001–sf10, uniform and
  * Zipf) lands bit-identical, and a flip would surface as a loud oracle
  * mismatch, not a silent wrong answer.
  *
  * On-disk root lives under java.io.tmpdir keyed by the corpus path — a
  * readable sanitized tag PLUS a hash of the raw path, so two distinct
  * corpora whose paths collide after sanitization (/tmp/sf_1 vs /tmp/sf-1,
  * case-differing paths) can never share a layout. On a real cluster this
  * would be a warehouse/object-store URI — the layout (bucketed parquet +
  * a catalog declaration) is identical either way. Table declarations are
  * per-session (in-memory catalog): [[ensureLayout]] re-declares external
  * bucketed tables over the stored files when a fresh JVM finds them
  * undeclared.
  */
object PageRankLayout {

  private def tag(dataDir: String): String = {
    val readable = dataDir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
    // the readable tag is lossy (case folded, punctuation collapsed); the
    // appended raw-path hash makes distinct corpora collision-free
    f"${readable}_${scala.util.hashing.MurmurHash3.stringHash(dataDir)}%08x"
  }

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

  /** Fingerprint of the lineitem columns the layout derives from. The
    * graph is a pure function of (l_orderkey, l_partkey), so content
    * changes in other columns are correctly invisible to it. */
  private def liFingerprint(li: DataFrame): Fp =
    CorpusFingerprint.of(li, col("l_orderkey"), col("l_partkey"))

  private def liProjection(spark: SparkSession, dataDir: String): DataFrame =
    Tables.lineitem(spark, dataDir).select("l_orderkey", "l_partkey")

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

  private def writeMeta(spark: SparkSession, root: String, nodeCount: Long,
      buckets: Int, fp: Fp): Unit = {
    import spark.implicits._
    Seq((fp.count, nodeCount, buckets, fp.xorFp, fp.sumFp.toString))
      .toDF("lineitem_count", "node_count", "buckets", "fp_xor", "fp_sum")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
  }

  private def metaFp(m: org.apache.spark.sql.Row): Fp =
    Fp(m.getAs[Long]("lineitem_count"), m.getAs[Long]("fp_xor"),
      new java.math.BigDecimal(m.getAs[String]("fp_sum")))

  /** Normalize an aggregated raw-weight edge frame: per-src total, one
    * w/tw division — exact small-integer doubles, so grouping order
    * cannot perturb wn. Shared by the full build and the append merge so
    * both paths land on identical stored floats. */
  private def normalized(edges: DataFrame): DataFrame = {
    val outw = edges.groupBy("src").agg(sum(col("w")).as("tw"))
    edges.join(outw.hint("shuffle_hash"), Seq("src"))
      .select(col("src"), col("dst"), col("w"), (col("w") / col("tw")).as("wn"))
  }

  /** Write the (src,dst,w,wn) edge frame + its node set + the meta row —
    * the shared tail of [[buildLayoutFrom]] and [[appendLayout]]. */
  private def writeLayout(spark: SparkSession, dataDir: String,
      edgesN: DataFrame, buckets: Int, fp: Fp): Unit = {
    val root = layoutRoot(dataDir)
    val nodes = edgesN.select(col("src").as("id")).distinct()
    writeBucketed(spark, edgesN, edgesTable(dataDir), s"$root/edges", "src", buckets)
    writeBucketed(spark, nodes.repartition(buckets, col("id")),
      nodesTable(dataDir), s"$root/nodes", "id", buckets)
    val nodeCount = spark.table(nodesTable(dataDir)).count()
    writeMeta(spark, root, nodeCount, buckets, fp)
  }

  /** One corpus-sized build pass over a CALLER-SUPPLIED (l_orderkey,
    * l_partkey) frame — the cost a 100 TB deployment pays once per corpus
    * snapshot: pair self-join → per-(src,dst) weight sum → out-weight
    * normalization (bit-identical arithmetic to
    * [[Relational.pageRankRanks]]'s in-query materialization), then ONE
    * bucketed write per table. The supplied frame's fingerprint becomes
    * the stored staleness contract, so building from a subset (the
    * incremental query's old-snapshot phase) is self-consistent. */
  def buildLayoutFrom(spark: SparkSession, dataDir: String, li: DataFrame): Unit = {
    val np = spark.sessionState.conf.numShufflePartitions
    val raw = Relational.coPurchaseEdgesFrom(li)
    val edges = raw.repartition(np, col("src"))
      .groupBy("src", "dst")
      .agg(sum(col("w").cast(DoubleType)).as("w"))
    writeLayout(spark, dataDir, normalized(edges), np, liFingerprint(li))
  }

  def buildLayout(spark: SparkSession, dataDir: String): Unit =
    buildLayoutFrom(spark, dataDir, liProjection(spark, dataDir))

  /** Fold an appended batch of ORDER-COMPLETE lineitem rows into the
    * stored layout — the incremental-maintenance path (round-18 verdict
    * directive 8; the graph twin of
    * [[graft.similarity.Similarity.appendAnnIndex]]).
    *
    * Co-purchase pairs never span orders, so a batch containing whole
    * orders produces its delta pairs from the BATCH ALONE (one batch-sized
    * self-join via [[Relational.coPurchaseEdgesFrom]]); the old corpus'
    * raw lineitem is NEVER rescanned (PageRankLayoutSpec proves it by
    * deleting the old corpus file before appending). The merge is an
    * aggregate-fold over stored EDGE aggregates — the `b2_incremental
    * _rollup` shape: stored (src,dst,w) ∪ delta (src,dst,w) → sum —
    * touching edge-table-sized data, orders of magnitude below lineitem.
    * Normalization then recomputes wn = w/tw for every src the merge
    * touched (and, harmlessly bit-identically, the rest): exact
    * small-integer double sums, so the merged layout is BIT-IDENTICAL to
    * a from-scratch rebuild at the same final corpus — `c14_pagerank
    * _layout_append` shares the full-build oracle VERBATIM on exactly
    * that claim.
    *
    * The merged snapshot is written to a NEW versioned location and then
    * swapped in — never overwriting the table it reads, never caching the
    * corpus-sized frame (an eager-checkpoint variant filled the storage
    * pool with the edge frame and squeezed the write's sort into a 722 MB
    * spill at sf1; the snapshot swap is both spill-free and the shape a
    * production table format runs — write new files, swap the pointer).
    * Fingerprint maintenance is incremental: stored fp ⊕ batch fp — the
    * old corpus is not rehashed either. */
  def appendLayout(spark: SparkSession, dataDir: String, batchLi: DataFrame): Unit = {
    val root = layoutRoot(dataDir)
    val meta = spark.read.parquet(s"$root/meta").head()
    val buckets = meta.getAs[Int]("buckets")
    declare(spark, edgesTable(dataDir), s"$root/edges", "src", buckets)
    val delta = Relational.coPurchaseEdgesFrom(batchLi)
      .groupBy("src", "dst").agg(sum(col("w").cast(DoubleType)).as("w"))
    val merged = spark.table(edgesTable(dataDir))
      .select("src", "dst", "w")
      .unionByName(delta)
      .repartition(buckets, col("src"))
      .groupBy("src", "dst").agg(sum(col("w")).as("w"))
    // write the next snapshot while the current one is still readable...
    val nextTable = edgesTable(dataDir) + "_next"
    writeBucketed(spark, normalized(merged), nextTable,
      s"$root/edges_next", "src", buckets)
    // ...then swap: the bucketed files move as-is, the declaration repeats
    // the layout they were written with
    spark.sql(s"DROP TABLE IF EXISTS ${edgesTable(dataDir)}")
    spark.sql(s"DROP TABLE IF EXISTS $nextTable")
    deleteRecursively(new java.io.File(s"$root/edges"))
    require(new java.io.File(s"$root/edges_next")
      .renameTo(new java.io.File(s"$root/edges")),
      s"appendLayout: snapshot swap failed for $root/edges")
    declare(spark, edgesTable(dataDir), s"$root/edges", "src", buckets)
    val edgesN = spark.table(edgesTable(dataDir))
    val nodes = edgesN.select(col("src").as("id")).distinct()
    writeBucketed(spark, nodes.repartition(buckets, col("id")),
      nodesTable(dataDir), s"$root/nodes", "id", buckets)
    val nodeCount = spark.table(nodesTable(dataDir)).count()
    writeMeta(spark, root, nodeCount, buckets,
      metaFp(meta).fold(liFingerprint(batchLi)))
  }

  /** Trust a stored layout only while its fingerprint — row count AND
    * order-independent content hash of (l_orderkey, l_partkey) — matches
    * the live corpus; otherwise rebuild. One meta read; only the expected
    * missing/corrupt-artifact failures mean "stale" (anything else — a
    * permissions fault, a concurrent writer — propagates instead of
    * silently triggering a corpus-sized rebuild). Always leaves this
    * session's catalog holding the table declarations. */
  def ensureLayout(spark: SparkSession, dataDir: String): Unit = {
    val root = layoutRoot(dataDir)
    val stored: Option[(Fp, Int)] =
      try {
        val m = spark.read.parquet(s"$root/meta").head()
        Some((metaFp(m), m.getAs[Int]("buckets")))
      } catch {
        // missing artifact or a meta row from an older schema: rebuild
        case _: AnalysisException => None
        case _: java.io.FileNotFoundException => None
        case _: IllegalArgumentException => None
      }
    stored match {
      case Some((fp, buckets)) if fp.matches(liFingerprint(liProjection(spark, dataDir))) =>
        declare(spark, edgesTable(dataDir), s"$root/edges", "src", buckets)
        declare(spark, nodesTable(dataDir), s"$root/nodes", "id", buckets)
      case _ => buildLayout(spark, dataDir)
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
    * with the layout's HashPartitioning. Iterations alternate between two
    * scratch tables (a write never reads its own target); the FINAL
    * vector is copied to a dedicated `result` table so the returned frame
    * survives later scratch-table rotation — it stays valid until the
    * next layout operation on the SAME corpus completes (each caller here
    * consumes it immediately; a concurrent-reader deployment would write
    * versioned result snapshots instead). */
  def fromLayoutRanks(spark: SparkSession, dataDir: String, iters: Int = 3): DataFrame = {
    ensureLayout(spark, dataDir)
    val root = layoutRoot(dataDir)
    val meta = spark.read.parquet(s"$root/meta").head()
    val cnt = meta.getAs[Long]("node_count")
    val buckets = meta.getAs[Int]("buckets")
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
    writeRank(spark, spark.table(rankTable(dataDir, cur)), dataDir, "result", buckets)
    spark.table(rankTable(dataDir, "result"))
  }

  /** Shared full-build oracle: the stored (src, dst, wn) edge table must
    * hash-match the CTE derivation over the FULL corpus — used verbatim by
    * the build query AND the append query (whose parity-with-rebuild claim
    * it therefore gates). */
  private val layoutEdgesOracle: String =
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
      |ORDER BY e.src, e.dst""".stripMargin

  /** Layout build as a registered, full-oracle query: builds + persists
    * the bucketed edge layout, then returns the PERSISTED edge table read
    * back from the store — the driver's hash compare checks the stored
    * artifact itself (src, dst, wn) against the oracle's normalization.
    * wn = w/tw divides two exact small integers held in double, so the
    * stored floats are bit-deterministic on both engines. */
  val pageRankLayoutBuild: QueryDef = QueryDef(
    "c14_pagerank_layout_build", "C14", layoutEdgesOracle) { (s, d) =>
    buildLayout(s, d)
    s.table(edgesTable(d)).select("src", "dst", "wn").orderBy("src", "dst")
  }

  /** Incremental layout maintenance as a registered, full-oracle query
    * (round-18 verdict directive 8): build the layout from an OLD corpus
    * snapshot (orders with l_orderkey % 8 ≠ 0), then [[appendLayout]] the
    * remaining ORDER-COMPLETE batch — delta pairs derived from the batch
    * alone, merged into the stored edge aggregates, weights renormalized,
    * fingerprint folded — and return the stored edge table. The oracle is
    * the FULL-corpus derivation VERBATIM ([[layoutEdgesOracle]]), so the
    * driver's hash compare IS the parity-with-from-scratch-rebuild gate:
    * the appended layout must be bit-identical to one built from the
    * whole corpus. The batch boundary is an order boundary (pairs never
    * span orders), matching the reference's hourly whole-file ingest. */
  val pageRankLayoutAppend: QueryDef = QueryDef(
    "c14_pagerank_layout_append", "C14", layoutEdgesOracle) { (s, d) =>
    val li = liProjection(s, d)
    buildLayoutFrom(s, d, li.where(pmod(col("l_orderkey"), lit(8)) =!= 0))
    appendLayout(s, d, li.where(pmod(col("l_orderkey"), lit(8)) === 0))
    s.table(edgesTable(d)).select("src", "dst", "wn").orderBy("src", "dst")
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

  val all: Seq[QueryDef] =
    Seq(pageRankLayoutBuild, pageRankLayoutAppend, pageRankFromLayout)
}
