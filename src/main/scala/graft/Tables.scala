package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-provided parquet tables (FIXTURES.md §2) plus
  * shared helpers used across the query surface.
  *
  * Scale notes: every loader is a plain parquet scan — Spark's vectorized
  * reader + Catalyst column pruning / predicate pushdown do the heavy
  * lifting; callers must select/filter early so pushdown reaches the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet has shipped `ts` as TIMESTAMP(NANOS) in some testdata
    * generations (rejected by Spark's reader unless read as long) and as
    * TIMESTAMP(MICROS) in others — adapt to whichever the footer declares.
    * The nanos path is exact: the data carries no sub-µs precision, and
    * DuckDB's reader does the same µs conversion. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // NTZ to match every other table (pyarrow writes isAdjustedToUTC=false)
    // and the DuckDB oracle's naive TIMESTAMP — session tz is UTC, so the
    // wall-clock value is unchanged.
    val raw = load(s, d, "events")
    val ts = raw.schema("ts").dataType match {
      case LongType => timestamp_micros(expr("ts div 1000")) // nanos-as-long
      case _        => col("ts")                             // already µs
    }
    raw.withColumn("ts", ts.cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` queries run over
    * the same inputs (the reference's interactive-SQL surface, SURVEY §3.3).
    * `events` must go through its dedicated loader (nanos conversion) — the
    * raw parquet footer is rejected by Spark's reader otherwise. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  // ---- exact-aggregation helpers -------------------------------------
  // Double sums are order-dependent (non-associative fp addition), so a
  // Spark sum and a DuckDB oracle sum of the same column can differ in the
  // last ulps and fail a hash compare. All "money"-like columns in the
  // testdata carry at most 2 decimals, so we sum them as exact DECIMALs
  // (order-independent, overflow-checked) and cast the final result back
  // to DOUBLE — deterministic bit-identical output on both engines.
  // At 100 TB this costs one extra cast per row inside the partial
  // aggregate; the shuffle still carries one decimal per group.

  /** Cast a ≤2-decimal double column to an exact decimal. */
  def dec2(c: Column): Column = c.cast(DecimalType(14, 2))

  /** Order-independent exact sum of a 2-decimal double column, as double. */
  def moneySum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** CPU-spreading repartition AQE cannot coalesce. A bare
    * `repartition(col)` is ADVISORY: AQE's partition coalescing sizes the
    * post-shuffle partitions by BYTES toward the 64 MB advisory target,
    * which is exactly wrong when a small-bytes input feeds a high-fan-out
    * or CPU-heavy projection — measured on the winnow-md5 gram pipeline
    * at sf0.1: the ~10 MB of normalized docs coalesced to FIVE tasks at
    * local[32] before the ~2000× gram explode + per-gram md5, wall 7.1 s
    * at task-cpu 6.7 s (serial); with an explicit partition count
    * (REPARTITION_BY_NUM, which AQE must respect) the same pipeline runs
    * partition-parallel. Use for every "spread the per-row CPU" shuffle;
    * plain `repartition(col)` remains right when byte-sized coalescing is
    * wanted (e.g. write layout).
    *
    * Sizing rule: the count is pinned to `defaultParallelism`, so
    * per-partition bytes = input / cores — which GROWS as the core count
    * shrinks or the input grows. That is safe here because a spreadByKey
    * input is small-bytes by construction (that's exactly why AQE's
    * byte-sized coalescing collapsed it) and downstream shuffle/agg
    * operators spill gracefully rather than fail if a partition outgrows
    * task memory. Measured at the second parallelism (sf1 corpus,
    * local[8] vs local[32], 3-rep medians, 2026-08-15): the spread-heavy
    * queries run with ZERO spill at 4× the per-partition bytes — the
    * CPU-bound stage scales with cores (winnow-md5 12.6 s at 8 cores vs
    * 4.6 s at 32) while the shuffle-bound ones stay flat (span dedup
    * 4.2 vs 4.0 s, embedding near-dup 1.3 vs 1.4 s). If a FUTURE call
    * site ever spreads a byte-heavy input, the right fix is a plain
    * `repartition(col)` (AQE sizes by bytes), not a bigger constant
    * here. SpreadOpsSpec pins the count-follows-parallelism contract. */
  implicit final class SpreadOps(private val df: DataFrame) extends AnyVal {
    def spreadByKey(keys: Column*): DataFrame =
      df.repartition(df.sparkSession.sparkContext.defaultParallelism, keys: _*)
  }
}
