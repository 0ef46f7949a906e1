package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Lifecycle fuzz for the persisted ANN index (round-18 verdict
  * directive 7): the staleness contract is load-bearing for correctness —
  * a missed rebuild serves a stale index, a missed fold serves a
  * spuriously-stale one — so drive it with seeded random corpus
  * lifecycles and assert the one invariant that matters after EVERY draw:
  *
  *   from-index rows ≡ in-query IVF-PQ rows on the LIVE corpus
  *   (`annIvfPqFromIndex.fn` vs `annIvfPqMd5.fn`, the registered pair).
  *
  * Draw ops over a mutable copy of the sf0.001 embeddings corpus:
  *  - MUTATE: negate one random row's embedding (count-preserving — the
  *    exact change the round-17 count-only fingerprint could not see);
  *    the next ensure must detect content drift and rebuild.
  *  - APPEND: add 1–8 new rows (ids outside the training stratum,
  *    vec_id % 4 ≠ 0, per the append guard's no-retrain contract) to the
  *    corpus AND fold them into the stored index via [[Similarity
  *    .appendAnnIndex]] — the maintenance path: ensure must then TRUST
  *    the folded fingerprint (no rebuild) and still answer identically,
  *    because the batch stratum can never perturb the bounded sample.
  *  - TOUCH: rewrite the corpus with identical content (new files, same
  *    rows) — ensure must neither rebuild nor mis-trust.
  *
  * Draw count/seed come from SPARK_GRAFT_ANN_FUZZ_DRAWS /
  * SPARK_GRAFT_ANN_FUZZ_SEED (defaults 4 / 42 for the regular suite; the
  * committed sweep record in FUZZCAPS.md runs 25 draws). */
class AnnLifecycleFuzzSpec extends SparkSpec {

  private val draws = sys.env.get("SPARK_GRAFT_ANN_FUZZ_DRAWS").map(_.toInt).getOrElse(4)
  private val seed = sys.env.get("SPARK_GRAFT_ANN_FUZZ_SEED").map(_.toLong).getOrElse(42L)

  test(s"persisted-index lifecycle stays parity-green over $draws random " +
    s"mutate/append/touch draws (seed $seed)") {
    val rnd = new scala.util.Random(seed)
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_fuzz")
      .toFile.getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(Similarity.annIndexRoot(dir)))
    val src = graft.Tables.embeddings(spark, sf)
    val schema = src.schema
    src.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    def corpus = spark.read.parquet(s"$dir/embeddings.parquet")
    def rewrite(rows: Seq[org.apache.spark.sql.Row]): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    var nextId = corpus.agg(max("vec_id")).head().getLong(0) + 1
    val dims = src.head().getAs[scala.collection.Seq[Float]]("embedding").length

    for (i <- 1 to draws) {
      val op = rnd.nextInt(3) match {
        case 0 => // MUTATE: count-preserving content change
          val rows = corpus.collect().toSeq
          val at = rnd.nextInt(rows.size)
          val r = rows(at)
          val mut = org.apache.spark.sql.Row(
            r.getLong(0),
            r.getAs[scala.collection.Seq[Float]](1).map(x => -x),
            r.getInt(2))
          rewrite(rows.updated(at, mut))
          "mutate"
        case 1 => // APPEND: corpus grows; index folds, never rebuilds
          Similarity.ensureAnnIndex(spark, dir) // index must exist to fold into
          val k = 1 + rnd.nextInt(8)
          val newRows = (1 to k).map { _ =>
            while (nextId % 4 == 0) nextId += 1 // stay outside the training stratum
            val id = nextId; nextId += 1
            org.apache.spark.sql.Row(id,
              scala.collection.Seq.fill(dims)((rnd.nextFloat() - 0.5f) * 1.2f),
              rnd.nextInt(10))
          }
          rewrite(corpus.collect().toSeq ++ newRows)
          Similarity.appendAnnIndex(spark, dir,
            spark.createDataFrame(
              spark.sparkContext.parallelize(newRows, 1), schema)
              .select(col("vec_id"), col("embedding")))
          "append"
        case 2 => // TOUCH: same content, new files
          rewrite(corpus.collect().toSeq)
          "touch"
      }
      val fromIndex = Similarity.annIvfPqFromIndex.fn(spark, dir)
        .collect().map(_.toString).toSeq
      val inQuery = Similarity.annIvfPqMd5.fn(spark, dir)
        .collect().map(_.toString).toSeq
      assert(fromIndex.nonEmpty && fromIndex === inQuery,
        s"draw $i ($op): persisted-index answers diverged from the in-query derivation")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
