package graft.util

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.CorpusFingerprint.Fp

/** The staleness fingerprint's algebra: fold/unfold inverses, the empty-
  * corpus identity (round-18 ADVICE: bit_xor over zero rows is null and
  * must not NPE), and order independence. */
class CorpusFingerprintSpec extends SparkSpec {

  test("empty corpus has the identity fingerprint (no NPE on null bit_xor)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val fp = CorpusFingerprint.of(empty, col("a"), col("b"))
    assert(fp === Fp(0L, 0L, java.math.BigDecimal.ZERO))
    // identity under fold: x.fold(empty) == x
    val some = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val fpSome = CorpusFingerprint.of(some, col("a"), col("b"))
    assert(fpSome.fold(fp) === fpSome)
  }

  test("unfold is the exact inverse of fold") {
    import spark.implicits._
    val base = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val batch = Seq((7L, 8L), (9L, 10L)).toDF("a", "b")
    val fpBase = CorpusFingerprint.of(base, col("a"), col("b"))
    val fpBatch = CorpusFingerprint.of(batch, col("a"), col("b"))
    val folded = fpBase.fold(fpBatch)
    assert(folded.unfold(fpBatch).matches(fpBase))
    assert(folded.unfold(fpBase).matches(fpBatch))
    // and fold(unfold) round-trips too
    assert(fpBase.unfold(fpBatch).fold(fpBatch).matches(fpBase))
  }

  test("fingerprint is order- and partitioning-independent, content-sensitive") {
    import spark.implicits._
    val rows = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L))
    val a = rows.toDF("a", "b").repartition(1)
    val b = scala.util.Random.shuffle(rows).toDF("a", "b").repartition(7)
    assert(CorpusFingerprint.of(a, col("a"), col("b"))
      .matches(CorpusFingerprint.of(b, col("a"), col("b"))))
    val mutated = rows.updated(2, (5L, 7L)).toDF("a", "b")
    assert(!CorpusFingerprint.of(a, col("a"), col("b"))
      .matches(CorpusFingerprint.of(mutated, col("a"), col("b"))))
  }
}
