package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Isolated per-query benchmark: one FRESH JVM (and therefore a fresh
  * SparkSession, codegen cache, JIT profile, block manager) per headline
  * query, 3-rep median inside each child — the measurement the in-suite
  * numbers in BENCHFULL.json cannot give.
  *
  * Why this exists (round-10 verdict directive): the suite runs 155
  * queries back-to-back in one JVM, so any query's in-suite wall time
  * carries whatever JVM state the previous 150 left behind — two rounds in
  * a row an apparent regression (`c14_pagerank` r9, `c17_dedup_clusters`
  * r10) dissolved when re-measured alone. Committing BENCHISO.json kills
  * that ambiguity at the measurement layer: a real plan regression moves
  * BOTH records; JVM-state noise moves only the in-suite one.
  *
  * Mechanics: each child is `java -cp <this classpath> graft.Bench` with
  * `SPARK_GRAFT_BENCH_ONLY=<query>` — the exact committed bench code path,
  * so the two records differ only in process isolation, never in timing
  * harness. Children inherit the JDK-17 module opens from build.sbt's list
  * (duplicated here because the child is forked directly, not through
  * sbt). Results land in BENCHISO.json unless SPARK_GRAFT_BENCH_NOFILE is
  * set. */
object BenchIsolated {

  // keep in sync with build.sbt's jdk17AddOpens (same comment there)
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def num(json: String, key: String): Option[Double] = {
    val m = java.util.regex.Pattern.compile(
      "\"" + java.util.regex.Pattern.quote(key) + "\":(-?[0-9.]+)").matcher(json)
    if (m.find()) Some(m.group(1).toDouble) else None
  }

  /** Fork one `graft.Bench` child with `extraEnv`, return its stdout. */
  private def runChild(extraEnv: (String, String)*): (Int, String) = {
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
      "-cp", sys.props("java.class.path"),
      "graft.Bench")).toArray
    val pb = new ProcessBuilder(cmd: _*)
    extraEnv.foreach { case (k, v) => pb.environment().put(k, v) }
    // stderr INHERITs (Spark logs are chatty enough to fill a pipe
    // buffer and deadlock the child if left unread)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val p = pb.start()
    val out = new String(
      org.apache.commons.io.IOUtils.toByteArray(p.getInputStream),
      StandardCharsets.UTF_8)
    (p.waitFor(), out)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val queries = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Bench.headline)
    // One dedicated canary child (fresh JVM, like every query child), so
    // the isolated record is drift-normalizable against any other record
    // (per-query children run with BENCH_ONLY and skip the canary —
    // paying the ~4 s canary 36× would be waste, not signal).
    val canary: Seq[(String, Double)] = {
      val (code, out) = runChild(
        "SPARK_GRAFT_BENCH_CANARY_ONLY" -> "1",
        "SPARK_GRAFT_BENCH_NOFILE" -> "1")
      val line = out.linesIterator.find(_.contains("\"metric\":\"canary\""))
      if (code != 0 || line.isEmpty) {
        System.err.println(s"[bench-iso] canary child FAILED (exit $code)")
        Seq.empty
      } else Seq("range_mod_sum_s", "scan_sf01_lineitem_s")
        .flatMap(k => line.flatMap(num(_, k)).map(k -> _))
    }
    val results = queries.flatMap { q =>
      val (code, out) = runChild(
        "SPARK_GRAFT_BENCH_ONLY" -> q,
        "SPARK_GRAFT_BENCH_NOFILE" -> "1")
      val full = out.linesIterator
        .find(_.contains("\"metric\":\"total_all_queries\""))
      val wall = full.flatMap(num(_, q))
      val cpu = full.flatMap(l => num( // cpu_s map repeats the query key
        l.substring(l.indexOf("\"cpu_s\"").max(0)), q))
      if (code != 0 || wall.isEmpty)
        System.err.println(s"[bench-iso] $q FAILED (exit $code)")
      else
        System.err.println(s"[bench-iso] $q ${wall.get}s wall, ${cpu.getOrElse(-1.0)}s cpu")
      wall.map(w => (q, w, cpu.getOrElse(-1.0)))
    }
    def jmap(es: Seq[(String, Double)]) = es
      .map { case (k, v) => "\"" + k + "\":" + String.format(
        java.util.Locale.ROOT, "%.3f", v) }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total_isolated","value":${String.format(java.util.Locale.ROOT, "%.3f",
        results.map(_._2).sum)},"unit":"sec","n_queries":${results.size},""" +
        (if (canary.isEmpty) "" else s""""canary":${jmap(canary)},""") +
        s""""queries":${jmap(results.map(r => r._1 -> r._2))},""" +
        s""""cpu_s":${jmap(results.map(r => r._1 -> r._3))},"sf":"$sfDir"}"""
    println(line)
    // SPARK_GRAFT_BENCH_OUT: same direct-write contract as graft.Bench —
    // the sf1 refresh pass writes BENCHISO_SF1.json itself, no mv window
    if (!sys.env.contains("SPARK_GRAFT_BENCH_NOFILE"))
      try Files.write(
        Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCHISO.json")),
        (line + "\n").getBytes(StandardCharsets.UTF_8))
      catch { case e: Throwable =>
        System.err.println(s"[bench-iso] record write failed: ${e.getMessage}")
      }
  }
}
