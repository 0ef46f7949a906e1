package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SKEWCHECK spot bench (dev tool, SKEWCHECK.md): on a `--skew` corpus
  * (scripts/gen_sf.py — Zipf-redirected o_custkey, top key tens of
  * percent of orders) time the SAME join+aggregate three ways:
  *
  *  - `plain`         orders ⋈ customer on custkey, AQE skew-join ON with
  *                    its thresholds scaled to the corpus (the defaults —
  *                    256 MB skewed-partition floor — are cluster-sized
  *                    and never trigger at sf1, which would make "AQE"
  *                    a misleading no-op label)
  *  - `plain_noskew`  AQE's skewJoin handling OFF — what a planner
  *                    without runtime skew mitigation does
  *  - `salted`        [[graft.operators.ScaleOps.saltedJoin]] with
  *                    salt=64 — the engine's own pre-planned mitigation,
  *                    shuffle key (custkey, salt). Salt COUNT must be
  *                    several × the shuffle partition count, not "a few":
  *                    the salt splits the KEY into granules but their
  *                    partition PLACEMENT is hashed, and at salt=8 into
  *                    32 partitions this bench measured 4 of the hot
  *                    key's 8 granules birthday-colliding into ONE
  *                    reducer (2.0M of 3.8M hot rows back on one task —
  *                    most of the skew resurrected). 64 granules of 60k
  *                    rows level out by the law of large numbers.
  *  - `hot_salted`    [[graft.operators.ScaleOps.hotSaltedJoin]] — salt
  *                    ONLY the sample-detected hot keys, so large salt
  *                    costs |hot|×salt replicated dim rows instead of
  *                    |dim|×salt. The production form.
  *
  * Wall time alone cannot see the hot reducer at sf1 (the top key's
  * partition is ~10 MB ≈ tens of milliseconds of join work inside a
  * ~1 s query), so each variant also reports the per-task runtime shape
  * of its timed reps — p50 and max task ms via a TaskEnd listener. The
  * hot reducer IS the max task: on the skewed corpus `plain_noskew`'s
  * max task carries the whole hot key while `salted` caps it at ~1/salt
  * of that, and THAT ratio is what survives a 100× scale-up (the hot
  * task grows linearly with data; the p50 task is pinned by partition
  * sizing). Row counts are asserted identical across variants, so the
  * numbers compare equal work. Median of `SPARK_GRAFT_BENCH_REPS`
  * (default 3) wall per variant, forced via noop write. One JSON line.
  *
  * Expectation being tested (round-11 verdict directive 5): on the
  * skewed corpus `salted`'s max task sits far below `plain_noskew`'s
  * and in the band AQE's own splitting reaches; on UNIFORM data salting
  * pays replication overhead for nothing (wall and max-task parity at
  * best) — which is why saltedJoin is an opt-in operator, not a default
  * rewrite. */
object SkewBench {

  private final class TaskTimes extends SparkListener {
    // (runtime ms, is-reduce): a task that read shuffle input is a reduce
    // task — the hot JOIN KEY can only land there, so `max over reduce
    // tasks` isolates the hot reducer from scan/salt map tasks (salted's
    // own max task is otherwise its dim-replication map work)
    val ms = ArrayBuffer.empty[(Long, Boolean)]
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      val m = e.taskMetrics
      if (m != null)
        ms += ((m.executorRunTime, m.shuffleReadMetrics.totalBytesRead > 0))
    }
    def snapshot(): Seq[(Long, Boolean)] = synchronized { ms.toSeq }
  }

  private def time(reps: Int)(f: => Unit): Double = {
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.sorted
    times(times.size / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1skew"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new TaskTimes
    spark.sparkContext.addSparkListener(listener)

    // fact-side multiplier (deterministic union of identical copies):
    // at sf1 the hot key is ~12 MB ≈ 250 ms of reducer work, inside
    // per-task noise — the first run of this bench proved wall AND
    // max-task blind to the skew at mult=1 (both corpora identical, and
    // salted's max task was its own dim-replication task). mult=8 puts
    // ~3.8 M rows on the hot reducer so the quantity under test
    // dominates its stage, which is exactly the 100 TB shape: hot-key
    // volume >> per-task constants.
    val mult = sys.env.getOrElse("SPARK_GRAFT_SKEW_MULT", "8").toInt
    def orders0 = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    def orders = (1 until mult).foldLeft(orders0)((d, _) => d.unionAll(orders0))
    def customer = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    def aggAndSink(df: DataFrame): Unit =
      df.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("price_sum"))
        .write.format("noop").mode("overwrite").save()
    // the join is NEVER broadcastable in the scenario under test — at
    // 100 TB the dim is too big; pin that here or local[N] broadcasts
    // the small customer side and no skew is visible at all
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // scale AQE's skew-join thresholds to the corpus: defaults are 256 MB
    // floor × 5× median — cluster numbers a ~10 MB hot partition never
    // reaches. 1 MB floor / 2 MB split target keep the same 5× factor
    // semantics at sf1 size.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")

    val saltN = sys.env.getOrElse("SPARK_GRAFT_SKEW_SALT", "64").toInt
    def plainJoin = orders.join(customer, Seq("custkey"))
    def saltedJoin = graft.operators.ScaleOps.saltedJoin(
      orders, customer, "custkey", salt = saltN)
    // the production form: only DETECTED hot keys are salted (sample says
    // which), so salt can be large without replicating the whole dim
    def hotSaltedJoin = graft.operators.ScaleOps.hotSaltedJoin(
      orders, customer, "custkey", salt = saltN,
      sampleFraction = 0.01, minSampleCount = 1000L)

    // equal-work guard
    val n = plainJoin.count()
    require(saltedJoin.count() == n, "salted join changed the row count")
    require(hotSaltedJoin.count() == n, "hot-salted join changed the row count")

    // measure one variant: one UNTIMED warm pass of ITS OWN plan first
    // (each variant's generated code JITs on first execution — without
    // this, a variant's rep-1 tasks carry compilation and its max-task
    // number lies), then median wall of `reps` + the task-runtime shape
    // (p50/max ms) across those reps' tasks
    def measure(f: => Unit): (Double, Long, Long, Long) = {
      f // per-variant warmup
      val before = listener.snapshot().size
      val wall = time(reps)(f)
      Thread.sleep(300) // listener delivery is async
      val all = listener.snapshot().drop(before)
      val ts = all.map(_._1).sorted
      val red = all.filter(_._2).map(_._1)
      if (ts.isEmpty) (wall, 0L, 0L, 0L)
      else (wall, ts(ts.size / 2), ts.last,
        if (red.isEmpty) 0L else red.max)
    }

    val plain = measure(aggAndSink(plainJoin))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val plainNoSkew = measure(aggAndSink(plainJoin))
    val salted = measure(aggAndSink(saltedJoin))
    val hotSalted = measure(aggAndSink(hotSaltedJoin))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    println(
      f"""{"metric":"skew_join_bench","sf":"$sfDir","rows":$n,"reps":$reps,"mult":$mult,""" +
      f""""plain_aqe_s":${plain._1}%.3f,"plain_noskewjoin_s":${plainNoSkew._1}%.3f,""" +
      f""""salted_s":${salted._1}%.3f,"hot_salted_s":${hotSalted._1}%.3f,""" +
      f""""task_ms_p50":{"plain_aqe":${plain._2},"plain_noskewjoin":${plainNoSkew._2},"salted":${salted._2},"hot_salted":${hotSalted._2}},""" +
      f""""task_ms_max":{"plain_aqe":${plain._3},"plain_noskewjoin":${plainNoSkew._3},"salted":${salted._3},"hot_salted":${hotSalted._3}},""" +
      f""""task_ms_max_reduce":{"plain_aqe":${plain._4},"plain_noskewjoin":${plainNoSkew._4},"salted":${salted._4},"hot_salted":${hotSalted._4}}}""")

    // ---- Scenario 2 (round-13 verdict directive 5): aggregate ON the
    // join key — the shape AQE's OptimizeSkewedJoin cannot split.
    // `orders ⋈ customer GROUP BY custkey`: splitting the join partition
    // would duplicate a key group across tasks and corrupt the per-key
    // aggregate, so AQE validates-and-reverts (ScaleOpsSpec pins the
    // plan-level decline) — with skewJoin ENABLED the hot reducer still
    // carries the whole hot key. hotSaltedJoin levels the join on
    // (key, salt); the per-(key, salt) partial aggregate then folds each
    // granule and the final merge moves `salt` pre-aggregated rows per
    // hot key. THIS is the measured case the chooser contract
    // (ScaleOps.hotSaltedJoin scaladoc) routes to salting.
    def aggOnKeySink(df: DataFrame): Unit =
      df.groupBy("custkey")
        .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("price_sum"))
        .write.format("noop").mode("overwrite").save()
    val n2 = aggOnKeyRows(plainJoin)
    require(aggOnKeyRows(hotSaltedJoin) == n2,
      "hot-salted agg-on-key changed the group count")
    val aggPlain = measure(aggOnKeySink(plainJoin))     // AQE skewJoin ON, declines
    val aggHot = measure(aggOnKeySink(hotSaltedJoin))
    println(
      f"""{"metric":"skew_agg_on_join_key_bench","sf":"$sfDir","groups":$n2,"reps":$reps,"mult":$mult,""" +
      f""""plain_aqe_s":${aggPlain._1}%.3f,"hot_salted_s":${aggHot._1}%.3f,""" +
      f""""task_ms_p50":{"plain_aqe":${aggPlain._2},"hot_salted":${aggHot._2}},""" +
      f""""task_ms_max":{"plain_aqe":${aggPlain._3},"hot_salted":${aggHot._3}},""" +
      f""""task_ms_max_reduce":{"plain_aqe":${aggPlain._4},"hot_salted":${aggHot._4}}}""")
    spark.stop()
  }

  private def aggOnKeyRows(df: DataFrame): Long =
    df.groupBy("custkey").agg(count(org.apache.spark.sql.functions.lit(1))).count()
}
