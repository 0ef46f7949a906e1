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
  * @param baseline Some(reason) marks a deliberately-registered exact/
  *               all-pairs formulation that is NOT the 100 TB path: it
  *               exists as an oracle-checkable correctness anchor for a
  *               registered scale twin, which the reason must name.
  *               PlanHygieneSpec exempts baseline-tagged plans from the
  *               nested-loop ban and RegistrySpec asserts the named twin
  *               is actually registered.
  */
final case class QueryDef(
    name: String,
    survey: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    baseline: Option[String] = None) {

  /** Tag this query as a deliberate non-scale baseline; `reason` must name
    * the registered scale twin (e.g. "all-pairs exact; twin c18_knn_agg"). */
  def asBaseline(reason: String): QueryDef = copy(baseline = Some(reason))
}

object QueryDef {
  def apply(name: String, survey: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, survey, fn, Some(oracle))

  def noOracle(name: String, survey: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, survey, fn, None)
}
