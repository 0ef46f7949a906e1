package graft
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Locale
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Timing uses a noop-format write so the FULL plan
  * executes and every output column materializes — `.count()` would let
  * Catalyst prune columns and collapse projection-only queries to a
  * metadata scan (round-2 verdict fix).
  *
  * Output layout is tail-window-aware: the harness that captures this run
  * keeps only the last ~2000 characters of stdout, and with 77 registered
  * queries a single all-queries JSON line is longer than that — its head
  * (with the total) gets truncated away. So the LAST line printed is a
  * compact summary (total + the headline query per SURVEY section) that
  * always fits in the window whole, while the full per-query map goes to
  * the preceding line and to BENCHFULL.json in the working directory. */
object Bench {

  /** One representative query per SURVEY §2 section — the set whose timings
    * ride in the compact summary line. Keep this list short: the summary
    * line must stay well under the ~2000-char stdout tail window. */
  private[graft] val headline: Seq[String] = Seq(
    "a09_purchases_typed", "b2_hourly_trend", "b3_per_user_stats",
    "c1_scan_project", "c2_filter_pushdown", "c3_broadcast_join",
    "c4_shuffle_join", "c5_semi_join", "c6_full_outer_join", "c7_range_join",
    "c8_asof_join", "c9_tpch_q1", "c10_count_distinct", "c11_cube",
    "c12_window_funcs", "c13_topk", "c14_union_distinct", "c15_string_funcs",
    "c16_session_window", "c17_minhash_lsh", "c17_ngram_jaccard",
    "c17_embedding_neardup_lsh", "c18_knn_agg", "c18_ann_ivf",
    "c19_quality_score", "c20_udaf_weighted_price", "mm_binary_meta",
    "pipeline_curate", "c17_dedup_clusters", "pipeline_pack",
    // the queries whose in-suite/isolated gap has been flagged across
    // rounds — the isolated record exists to adjudicate exactly these —
    // plus the round-11 triangle join, the other multi-stage graph shape
    "c14_pagerank", "c14_recursive_cte", "c14_triangle_count",
    // round 17: the persisted-layout query path, measured against
    // c14_pagerank (the in-query twin) — the build-once/query-many split
    "c14_pagerank_from_layout",
    // round 18: the other persisted-artifact legs, so BOTH artifacts'
    // build AND query paths carry iso sf0.1/sf1 counterparts for the sf10
    // scaling exponents (r17 verdict directive 4 — the "benched at every
    // rung" claim now holds for the ANN pair too)
    "c14_pagerank_layout_build", "c18_ann_index_build",
    "c18_ann_ivfpq_from_index",
    // round 19: the DELETE maintenance legs and the steepest (doc,term)
    // count-table member — headliner status gives the round-19 sf10
    // additions their iso sf0.1/sf1 counterparts (same rationale as the
    // r17/r18 rows above; scalecheck10's coverage note named these)
    "c14_pagerank_layout_delete", "c18_ann_index_delete", "c19_bigram_ppl",
    // round 17: the pair-generating plans the sf10 rung now tracks
    // (r16 verdict directive 4) — headliner status gives them the iso
    // sf0.1/sf1 counterparts the scaling exponents are computed from
    "pipeline_span_dedup_apply", "c17_passage_dedup", "c17_containment",
    "c17_editdist_join", "c17_incremental_dedup")

  private def fmt(v: Double): String = String.format(Locale.ROOT, "%.3f", v)

  private def toJson(entries: Seq[(String, Double)]): String =
    entries.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")

  /** Task-metric accumulator: per-query shuffle volume and spill, the
    * quantitative side of every "one shuffle on the key" claim. Listener
    * delivery is asynchronous, so totals attribute to the query whose reps
    * were running when the task finished — exact enough at per-query
    * granularity (queries run serially). */
  private final class MetricsListener extends SparkListener {
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    val spilled = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spilled.addAndGet(m.diskBytesSpilled)
      }
    }
    def snapshot: (Long, Long, Long) =
      (shuffleRead.get, shuffleWrite.get, spilled.get)
  }

  /** 1-minute load average — stamped into the output so a contaminated run
    * (concurrent sbt/compile load on the box) is self-labeling instead of
    * reading as a code regression (round-5 verdict: the recorded 61.5 s had
    * a 2–6× blow-up in one query cluster that a quiet-box rerun erased). */
  private def loadAvg1: Double =
    try {
      val s = new String(Files.readAllBytes(Paths.get("/proc/loadavg")),
        StandardCharsets.UTF_8)
      s.split("\\s+")(0).toDouble
    } catch { case _: Throwable => -1.0 }

  /** Whole-JVM CPU time in seconds (driver + all local[N] executor threads).
    * Queries run serially, so the per-rep delta attributes to one query.
    * The point (round-8 verdict): external load inflates WALL but not OUR
    * CPU, so a rep whose wall grows while cpu stays flat is contaminated —
    * the run self-diagnoses instead of reading as a plan regression.
    * (cpu > wall is normal here: N threads work in parallel.) */
  private def processCpuSec: Double =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      .getProcessCpuTime / 1e9
    catch { case _: Throwable => -1.0 }

  /** Fixed CANARY pair stamped into every bench record (round-13 verdict
    * directive 1): two pinned queries whose PLAN never changes between
    * rounds, so any two records can be drift-normalized against each
    * other — the r11→r13 uniform 1.39× box drift on identical isolated
    * queries was only attributable by hand-comparing trivially-planned
    * queries; with the canary it is one division.
    *
    *  - `range_mod_sum_s`: sum(id % 7) over a 1e9 range — pure
    *    whole-stage-codegen CPU, zero IO, data-independent. Tracks the
    *    box's compute speed (CPU contention, frequency scaling).
    *  - `scan_sf01_lineitem_s`: Q6-shaped aggregate over the PINNED
    *    read-only sf0.1 lineitem (never the record's own sfDir — a canary
    *    must be the same work in every record, including sf1 ones).
    *    Tracks IO + parquet decode throughput.
    *
    * 3-rep median each, same noop-write forcing as the suite. Reading a
    * cross-record delta: divide both records' per-query numbers by their
    * own canary before comparing; a uniform move in the canary is box
    * drift, a per-query move the canary doesn't share is a plan change. */
  private[graft] val canaryScanDir = "/root/testdata/sf0.1"
  private[graft] def runCanary(spark: SparkSession): Seq[(String, Double)] = {
    import org.apache.spark.sql.functions._
    def med(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.size / 2)
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // 1e9 rows ≈ 1.4 s at local[32] — big enough that scheduler noise is
    // a few % of the reading, small enough to cost ~4 s per record
    val rangeS = med(force(
      spark.range(1000000000L).selectExpr("sum(id % 7) AS s")))
    // the scan canary reads the PINNED sf0.1 dir, not the record's own
    // sfDir; if that dir is missing/unreadable (sf1-only box), emit the
    // record without the pair instead of aborting the whole run —
    // RecordsSpec's canary guard then flags the record as uncommittable
    val scanS =
      try Some(med(force(
        Tables.lineitem(spark, canaryScanDir)
          .select(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue")))))
      catch { case e: Throwable =>
        System.err.println(s"[bench] scan canary unavailable ($canaryScanDir): ${e.getMessage}")
        None
      }
    Seq("range_mod_sum_s" -> rangeS) ++
      scanS.map("scan_sf01_lineitem_s" -> _)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadBefore = loadAvg1
    // Canary-only mode: BenchIsolated's dedicated canary child (its
    // per-query children skip the canary via BENCH_ONLY below).
    if (sys.env.contains("SPARK_GRAFT_BENCH_CANARY_ONLY")) {
      val c = runCanary(spark)
      println(s"""{"metric":"canary","canary":${toJson(c)},"load1":${fmt(loadAvg1)}}""")
      spark.stop()
      return
    }
    // One warmup pass (JIT + codegen cache) on the flagship query.
    try SparkEntry.queries("c9_tpch_q1")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Canary BEFORE the suite (post-warmup, so codegen/JIT constants are
    // shared with the suite's own steady state). Skipped in BENCH_ONLY
    // dev-loop/iso-child runs — partial records never carry a canary that
    // could be mistaken for the committed one — EXCEPT when
    // SPARK_GRAFT_BENCH_FORCE_CANARY opts in: the SCALECHECK10 subset
    // records are deliberate committed partials and need the drift
    // normalizer like any other record.
    val canary: Seq[(String, Double)] =
      if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY") &&
        !sys.env.contains("SPARK_GRAFT_BENCH_FORCE_CANARY")) Seq.empty
      else runCanary(spark)
    // Median-of-reps per query: a single timing right after an sbt compile
    // (or next to any concurrent load) can be several × off — the median
    // absorbs one bad repetition, and the min/max spread in BENCHFULL.json
    // shows how noisy the box was.
    // Dev-loop filter: SPARK_GRAFT_BENCH_ONLY="q1,q2" times just those
    // queries (combine with SPARK_GRAFT_BENCH_NOFILE=1 so the partial total
    // never overwrites the committed full record).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val defs = only.fold(Registry.defs)(names => Registry.defs.filter(q => names(q.name)))
    // Reps are interleaved round-robin (full pass 1 over every query, then
    // pass 2, then pass 3) instead of back-to-back per query: external load
    // bursts on this box are time-local (round-7's driver run had a ~40 s
    // burst that poisoned all 3 consecutive reps of two queries, reading as
    // an 11 s median for a 0.6 s query). With interleaving a burst shorter
    // than one full pass inflates at most ONE rep of any query, which the
    // median then discards.
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)
    val timesByQuery =
      scala.collection.mutable.LinkedHashMap(defs.map(q => q.name -> Vector.empty[Double]): _*)
    val cpuByQuery =
      scala.collection.mutable.LinkedHashMap(defs.map(q => q.name -> Vector.empty[Double]): _*)
    val shuffleByQuery =
      scala.collection.mutable.LinkedHashMap(defs.map(q => q.name -> (0L, 0L, 0L)): _*)
    val okRepsByQuery =
      scala.collection.mutable.LinkedHashMap(defs.map(q => q.name -> 0): _*)
    // ONE rep of one query, shared by the main loop and the adaptive
    // re-reps so every rep — including extras — runs inside the same
    // before/after listener snapshot (shuffle/spill from a re-rep counts
    // toward the record's zero-spill claim) and a THROWN rep appends no
    // timing: a fast failure (transient OOM) must not become the 5-rep
    // min and pull the median down (round-14 advice).
    def runRep(q: QueryDef, tag: String): Unit = {
      val before = listener.snapshot
      val cpu0 = processCpuSec
      val t0 = System.nanoTime()
      val ok =
        try { q.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name}$tag failed: ${e.getMessage}")
          false
        }
      if (ok) {
        timesByQuery(q.name) = timesByQuery(q.name) :+ (System.nanoTime() - t0) / 1e9
        cpuByQuery(q.name) = cpuByQuery(q.name) :+ (processCpuSec - cpu0)
        okRepsByQuery(q.name) = okRepsByQuery(q.name) + 1
      }
      val after = listener.snapshot
      val (r0, w0, s0) = shuffleByQuery(q.name)
      shuffleByQuery(q.name) = (
        r0 + after._1 - before._1, w0 + after._2 - before._2, s0 + after._3 - before._3)
    }
    (0 until math.max(1, reps)).foreach { _ =>
      defs.foreach(q => runRep(q, ""))
    }
    // Adaptive re-reps (round-13 advice + round-14 verdict finding 1):
    // with 3 reps, ONE load-burst outlier leaves the median between two
    // honest values — but two contamination shapes demand more evidence:
    //  - spread max > 3× median: at least one rep was contaminated, and a
    //    second contaminated rep WOULD own the median;
    //  - median > 2× min: the MEDIAN itself is contaminated — for a
    //    deterministic workload the min rep is the contamination-robust
    //    anchor (the driver's r14 run had pagerank at median 20.96 s over
    //    a 5.75 s min with the max-only trigger never firing).
    // Flagged queries get 2 extra reps (median of 5), run after the main
    // interleaved passes so they land outside the burst that flagged
    // them. The record lists who was re-repped ("extra_repped"); medians
    // STILL over 2× their min after the extra evidence are flagged
    // "noisy_medians" so a reader never mistakes one for a plan cost.
    def medianOverMin(name: String, factor: Double): Boolean = {
      val t = timesByQuery(name).sorted
      t.nonEmpty && t(t.size / 2) > factor * t.head
    }
    val extraRepped: Seq[String] = if (reps < 3) Seq.empty else {
      val noisy = defs.filter { q =>
        val t = timesByQuery(q.name).sorted
        t.nonEmpty && (t.last > 3 * t(t.size / 2) || medianOverMin(q.name, 2.0))
      }
      noisy.foreach { q =>
        (0 until 2).foreach(_ => runRep(q, " extra rep"))
      }
      noisy.map(_.name)
    }
    val noisyMedians: Seq[String] =
      defs.map(_.name).filter(medianOverMin(_, 2.0))
    val results = timesByQuery.toSeq.map { case (name, raw) =>
      if (raw.isEmpty) (name, -1.0, -1.0, -1.0) // every rep threw — flagged, not fabricated
      else {
        val times = raw.sorted
        (name, times(times.size / 2), times.head, times.last)
      }
    }
    // per-query shuffle-write MB averaged over that query's SUCCESSFUL rep
    // count — extra reps are inside the listener accounting, so the
    // divisor is per-query, not the global rep count (read ≈ write
    // locally; spill recorded only if nonzero anywhere)
    val shuffleMb = shuffleByQuery.toSeq.map { case (n, (_, w, _)) =>
      "\"" + n + "\":" + fmt(w.toDouble / math.max(1, okRepsByQuery(n)) / 1e6)
    }.mkString("{", ",", "}")
    val totalSpill = shuffleByQuery.valuesIterator.map(_._3).sum
    val loadAfter = loadAvg1
    val medians = results.map { case (n, med, _, _) => n -> med }
    val total = medians.map(_._2).sum
    // median CPU seconds per query — read next to the wall median: a wall
    // median far above its own earlier record while cpu_s is unchanged is
    // the contamination signature (see README "Benchmarking").
    val cpuMedians = cpuByQuery.toSeq.map { case (n, raw) =>
      val c = raw.sorted; n -> c(c.size / 2)
    }
    val cpuTotal = cpuMedians.map(_._2).sum
    val spread = results.map { case (n, _, mn, mx) =>
      "\"" + n + "\":[" + fmt(mn) + "," + fmt(mx) + "]"
    }.mkString("{", ",", "}")
    val env =
      s""""reps":$reps,"load1_before":${fmt(loadBefore)},"load1_after":${fmt(loadAfter)}""" +
        (if (canary.isEmpty) "" else s""","canary":${toJson(canary)}""") +
        (if (extraRepped.isEmpty) ""
         else extraRepped.map("\"" + _ + "\"")
           .mkString(""","extra_repped":[""", ",", "]")) +
        (if (noisyMedians.isEmpty) ""
         else noisyMedians.map("\"" + _ + "\"")
           .mkString(""","noisy_medians":[""", ",", "]"))
    val fullLine =
      s"""{"queries":${toJson(medians)},"cpu_s":${toJson(cpuMedians)},"cpu_total":${fmt(cpuTotal)},"spread":$spread,"shuffle_write_mb":$shuffleMb,"spilled_bytes":$totalSpill,"metric":"total_all_queries","value":${fmt(total)},"unit":"sec",$env,"sf":"$sfDir"}"""
    println(fullLine)
    // Smoke runs (sf0.001, reps=1) set SPARK_GRAFT_BENCH_NOFILE=1 so they
    // don't clobber the committed clean sf0.1 median-of-3 record.
    // SPARK_GRAFT_BENCH_OUT redirects the record file (refresh_bench.sh's
    // sf1/local[8] passes write their own files DIRECTLY — the old
    // write-then-mv left BENCHFULL.json holding sf1 numbers if the script
    // died between the two steps; round-14 advice).
    if (!sys.env.contains("SPARK_GRAFT_BENCH_NOFILE"))
      try Files.write(
        Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCHFULL.json")),
        (fullLine + "\n").getBytes(StandardCharsets.UTF_8))
      catch { case e: Throwable =>
        System.err.println(s"[bench] BENCHFULL.json write failed: ${e.getMessage}")
      }
    val head = medians.filter(r => headline.contains(r._1))
    println(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${medians.size},"cpu_total":${fmt(cpuTotal)},$env,"queries":${toJson(head)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
