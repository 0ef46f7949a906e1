package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (PageRank label/rank frames,
  * connected-components labels): every round re-derives a frame from the
  * previous one, so without a checkpoint the plan grows linearly with
  * iterations and a single lost partition recomputes the whole history.
  *
  * Two modes, chosen by `checkpointDir`:
  *
  *  - `None` (default, the fast path): `localCheckpoint(eager)` — blocks
  *    live in executor storage, zero filesystem traffic. Correct on
  *    local[n] and on clusters that tolerate a query retry, but
  *    executor-LOCAL blocks are not fault-tolerant: a lost node kills the
  *    query mid-iteration.
  *  - `Some(dir)`: reliable `checkpoint(eager)` against `dir` (HDFS/S3/
  *    local URI) — a lost executor recomputes nothing; the frame reloads
  *    from the checkpoint files. The price is one write+read of the frame
  *    per iteration, which for the O(#nodes) label/rank frames is small
  *    next to the per-iteration edge join. This is the mode a 100×-scale
  *    run should set.
  *
  * Superseded-state cleanup mirrors the modes: local-checkpoint blocks are
  * freed eagerly ([[org.apache.spark.sql.GraftBridge.freeLocalCheckpoint]])
  * the moment the next iteration materializes; reliable checkpoint FILES
  * are left to Spark's own lifecycle (deleted by the ContextCleaner when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, otherwise by
  * whoever owns `dir` — the caller's directory, the caller's retention).
  */
final case class IterativeCheckpointer(checkpointDir: Option[String]) {

  /** Truncate `df`'s lineage (eager in both modes: the iterative loops
    * measure convergence right after, so laziness buys nothing). */
  def apply(df: DataFrame): DataFrame = checkpointDir match {
    case Some(dir) =>
      // setCheckpointDir is SparkContext-GLOBAL, and it creates a fresh
      // UUID subdirectory on every call — so instead of a per-instance
      // "set once" boolean (which lets two interleaved iterative operators,
      // or any caller changing the global dir mid-loop, silently redirect
      // each other's checkpoint files into a directory the other caller
      // owns), check the context's CURRENT dir against ours on EVERY
      // apply: set it when absent or foreign, but only re-point — never
      // assume a prior apply's setting survived the interleaving.
      val sc = df.sparkSession.sparkContext
      val want = new org.apache.hadoop.fs.Path(dir).toUri
      val current = sc.getCheckpointDir.map(new org.apache.hadoop.fs.Path(_))
      // the context dir is our requested dir plus the UUID subdir it minted
      val ours = current.exists(p =>
        Option(p.getParent).exists(_.toUri.getPath == want.getPath))
      if (!ours) sc.setCheckpointDir(dir)
      df.checkpoint(eager = true)
    case None => df.localCheckpoint(eager = true)
  }

  /** Release a superseded frame's storage where that is safe to do
    * eagerly (local-checkpoint blocks); reliable checkpoints keep their
    * files — see class doc. */
  def free(df: DataFrame): Unit =
    if (checkpointDir.isEmpty)
      org.apache.spark.sql.GraftBridge.freeLocalCheckpoint(df)
}
