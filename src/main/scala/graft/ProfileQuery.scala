package graft

import java.util.Locale
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query CPU anatomy: runs ONE registered query (args(0), default
  * c14_pagerank) `SPARK_GRAFT_PROF_REPS` times (default 3) in one JVM and
  * prints, per rep, where the process CPU went:
  *
  *   wall        — elapsed seconds
  *   proc_cpu    — whole-process CPU delta (what Bench records as cpu_s)
  *   task_cpu    — Σ executor task CPU (TaskMetrics.executorCpuTime): the
  *                 actual distributed work the plan did
  *   task_deser/ser, task_gc — scheduling + GC time inside tasks
  *   jvm_gc      — collector-reported GC wall across the JVM (×threads ≈
  *                 the GC share of proc_cpu)
  *
  * The point (round-11 verdict, PageRank directive): Bench's cpu_s is
  * whole-process CPU on a local[32] JVM — driver planning, codegen, and a
  * 32-thread collector all land in it. proc_cpu − task_cpu − GC is the
  * overhead a plan change cannot remove; task_cpu is what a plan change
  * could. This main makes that split a one-command measurement instead of
  * a guess. */
object ProfileQuery {

  private final class TaskCpuListener extends SparkListener {
    val cpuNs = new AtomicLong
    val runNs = new AtomicLong // executorRunTime is millis; stored as ns
    val gcMs = new AtomicLong
    val deserMs = new AtomicLong
    val serNs = new AtomicLong
    val tasks = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        cpuNs.addAndGet(m.executorCpuTime)
        runNs.addAndGet(m.executorRunTime * 1000000L)
        gcMs.addAndGet(m.jvmGCTime)
        deserMs.addAndGet(m.executorDeserializeTime)
        serNs.addAndGet(m.resultSerializationTime * 1000000L)
        tasks.incrementAndGet()
      }
    }
  }

  private def procCpu: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      .getProcessCpuTime / 1e9

  private def gcStats: (Long, Double) = {
    import scala.jdk.CollectionConverters._
    val beans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum / 1e3)
  }

  private def fmt(v: Double): String = String.format(Locale.ROOT, "%.2f", v)

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("c14_pagerank")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "3").toInt
    val q = Registry.defs.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new TaskCpuListener
    spark.sparkContext.addSparkListener(listener)
    (1 to reps).foreach { rep =>
      val (gcC0, gcT0) = gcStats
      val cpu0 = procCpu
      val (tc0, tr0, tg0, td0) =
        (listener.cpuNs.get, listener.runNs.get, listener.gcMs.get, listener.deserMs.get)
      val tk0 = listener.tasks.get
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener delivery is async; give the queue a beat before reading
      Thread.sleep(300)
      val (gcC1, gcT1) = gcStats
      println(s"[prof] $name rep=$rep wall=${fmt(wall)}s " +
        s"proc_cpu=${fmt(procCpu - cpu0)}s " +
        s"task_cpu=${fmt((listener.cpuNs.get - tc0) / 1e9)}s " +
        s"task_run=${fmt((listener.runNs.get - tr0) / 1e9)}s " +
        s"task_gc=${fmt((listener.gcMs.get - tg0) / 1e3)}s " +
        s"task_deser=${fmt((listener.deserMs.get - td0) / 1e3)}s " +
        s"jvm_gc=${fmt(gcT1 - gcT0)}s gc_n=${gcC1 - gcC0} " +
        s"tasks=${listener.tasks.get - tk0}")
    }
    spark.stop()
  }
}
