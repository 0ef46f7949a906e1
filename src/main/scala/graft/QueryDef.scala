package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator from SURVEY.md §2: a named Spark query over the
  * testdata tables plus (when SQL-expressible) the equivalent DuckDB SQL
  * the driver hash-checks it against.
  *
  * @param name   stable query id (keys `SparkEntry.queries`)
  * @param survey SURVEY.md §2 row(s) this query demonstrates (e.g. "C9")
  * @param fn     (spark, sfDir) => result DataFrame; must be deterministic:
  *               totally ordered output, exact (order-independent) aggregates
  * @param oracle equivalent DuckDB SQL over the same tables; None → the
  *               driver records a weaker rows-only check
  */
final case class QueryDef(
    name: String,
    survey: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, survey: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, survey, fn, Some(oracle))

  def noOracle(name: String, survey: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, survey, fn, None)
}
