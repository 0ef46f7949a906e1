package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column↔Expression converters —
  * the supported extension-point surface (classic.ExpressionUtils) is
  * package-private in Spark 4, so custom Catalyst expressions need this
  * one-file shim to be wrapped as user-facing Columns. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Release the block-manager storage behind a `localCheckpoint`ed frame.
    * Checkpoint RDDs are otherwise freed only when the JVM garbage-collects
    * the RDD object and the ContextCleaner notices — in an iterative loop
    * (PageRank) the superseded per-iteration checkpoints pile up for the
    * rest of the process. No-op for non-checkpoint frames. */
  def freeLocalCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
}
