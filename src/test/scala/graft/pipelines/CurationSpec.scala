package graft.pipelines

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end curation pipeline semantics on a planted corpus: each gate
  * removes exactly what it should, dedup keeps the lowest doc_id. */
class CurationSpec extends SparkSpec {

  test("curate applies language, quality, and dedup gates in one pass") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog and keeps running through the quiet green field all day"
    val corpus = Seq(
      (1L, "en", "s", good),                         // survives
      (2L, "en", "s", good),                         // exact dup of 1 → dropped
      (3L, "fr", "s", good),                         // wrong language
      (4L, "en", "s", "too short"),                  // under token floor
      (5L, "en", "s", ("x9 " * 40).trim),            // alpha ratio below 0.8
      (6L, "en", "s", good + " with one extra tail sentence to differ"))  // survives
    val docs = corpus.toDF("doc_id", "lang", "source", "text")
    val out = Curation.curate(docs, minTokens = 15, maxTokens = 5000, minAlpha = 0.8)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 6L))
    assert(out.forall(_.getDouble(3) >= 0.8))
  }

  test("registered curation query is non-trivial on the testdata") {
    val out = Curation.curateDocs.fn(spark, sf)
    val n = out.count()
    val total = graft.Tables.documents(spark, sf).count()
    assert(n > 0 && n < total) // the gates actually select
  }
}
