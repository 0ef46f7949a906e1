package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}

/** The composed corpus-curation pipeline a training-data run actually
  * executes — the LLM-pipeline pillars chained end-to-end instead of
  * exercised one at a time:
  *
  *   language filter → quality gates (token budget, alpha ratio) →
  *   exact dedup keep-first → per-doc token count for the batcher.
  *
  * Plan shape at 100 TB: the score-and-filter stage is one narrow
  * whole-stage-codegen projection (no shuffle, filters evaluated before
  * anything wide); the only shuffles are the dedup hash-aggregate on the
  * md5 fingerprint and its semi-join back — both keyed on uniformly
  * distributed hashes. Survivor selection uses aggregate-then-semi-join
  * (not a window) so the heavy table is shuffled once.
  */
object Curation {

  /** Reusable curation transform over a documents-shaped frame. */
  def curate(docs: DataFrame, minTokens: Int, maxTokens: Int, minAlpha: Double): DataFrame = {
    val nTokens = size(split(trim(col("text")), "\\s+"))
    val alphaCnt = length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
    val scored = docs.select(
      col("doc_id"), col("lang"), col("source"), col("text"),
      nTokens.as("n_tokens"),
      (alphaCnt.cast(DoubleType) / length(col("text"))).as("alpha_ratio"))
    val filtered = scored.where(
      col("lang") === "en" &&
        col("n_tokens").between(minTokens, maxTokens) &&
        col("alpha_ratio") >= minAlpha)
    val keep = filtered
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    filtered.join(keep, Seq("doc_id"), "left_semi")
      .select("doc_id", "source", "n_tokens", "alpha_ratio")
  }

  /** Registered end-to-end curation query with a full DuckDB oracle (every
    * stage is SQL-expressible: regex counts, md5 keep-first, semi-join). */
  val curateDocs: QueryDef = QueryDef(
    "pipeline_curate", "C17 C19 north_star-pipeline",
    """WITH scored AS (
      |  SELECT doc_id, lang, source, text,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens,
      |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
      |      / length(text) AS alpha_ratio
      |  FROM documents
      |), filtered AS (
      |  SELECT * FROM scored
      |  WHERE lang = 'en' AND n_tokens BETWEEN 20 AND 5000 AND alpha_ratio >= 0.8
      |), keep AS (
      |  SELECT min(doc_id) AS doc_id FROM filtered GROUP BY md5(text)
      |)
      |SELECT doc_id, source, n_tokens, alpha_ratio
      |FROM filtered WHERE doc_id IN (SELECT doc_id FROM keep)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    curate(Tables.documents(s, d), minTokens = 20, maxTokens = 5000, minAlpha = 0.8)
      .orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(curateDocs)
}
