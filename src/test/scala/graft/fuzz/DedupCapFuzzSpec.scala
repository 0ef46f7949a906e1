package graft.fuzz

import java.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup

/** Adversarial-skew fuzz for the dedup skew caps (round-10 verdict
  * directive 8): seeded corpus draws engineered to drive
  * [[graft.functions.BoundedDistinct]] variant buckets past their cap,
  * pinning BOTH contract halves of [[Dedup.editDistPairs]]:
  *
  *   1. the default path FAILS LOUDLY — an overflowed bucket raises at
  *      execution time instead of silently losing pairs (the exact-recall
  *      claim can never quietly break), and
  *   2. `failOnOverflow = false` degrades recall EXACTLY as documented —
  *      the output equals the brute-force edit-distance join restricted to
  *      pairs that share at least one NON-overflowed variant bucket,
  *      recomputed here from first principles (local deletion-variant
  *      sets + local Levenshtein), never a subset test alone.
  *
  * The committed multi-seed sweep record lives in FUZZCAPS.md; this spec
  * IS its reproduction command. */
class DedupCapFuzzSpec extends SparkSpec {

  /** Seeded draw: `hot` strings sharing one deletion variant (common stem +
    * distinct trailing char — every pair is a true substitution pair whose
    * ONLY shared variant is the stem bucket, which overflows any
    * cap < hot), plus `bg` random background strings with one planted
    * substitution partner per 4 strings (low-df buckets that must always
    * survive). */
  private def corpus(seed: Long, hot: Int, bg: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def randStr(n: Int) =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    require(hot <= alpha.length, "hot cluster is one trailing char wide")
    val stem = "capfuzz" + randStr(3)
    // distinct trailing chars: pairwise lev = 1 (last-char substitution)
    // and the ONLY shared variant is the stem (delete-last) bucket
    val hotRows = (0 until hot).map(i => s"$stem${alpha(i)}")
    val bgRows = scala.collection.mutable.ArrayBuffer.empty[String]
    while (bgRows.size < bg) {
      val s = randStr(8 + rnd.nextInt(4))
      bgRows += s
      if (bgRows.size % 4 == 0 && s.length > 2) {
        val pos = rnd.nextInt(s.length)
        val sub = s.updated(pos, alpha(rnd.nextInt(alpha.length)))
        if (sub != s) bgRows += sub // planted ed=1 substitution pair
      }
    }
    (hotRows ++ bgRows).distinct.zipWithIndex.map { case (s, i) => (i.toLong, s) }
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** identity + every single-character deletion, distinct — the same
    * neighborhood [[graft.functions.DeletionVariantHashes]] hashes. */
  private def variants(s: String): Set[String] =
    (s +: (0 until s.length).map(i => s.take(i) + s.drop(i + 1))).toSet

  /** The documented degraded-recall expectation: true ed≤1 pairs sharing at
    * least one variant whose corpus df (distinct ids) is within cap. */
  private def expectedPairs(rows: Seq[(Long, String)], cap: Int): Set[(String, String)] = {
    val df = rows.flatMap { case (_, s) => variants(s).map(_ -> s) }
      .groupBy(_._1).map { case (v, hits) => v -> hits.map(_._2).distinct.size }
    val surviving = df.filter(_._2 <= cap).keySet
    (for {
      (ia, a) <- rows; (ib, b) <- rows
      if ia < ib && lev(a, b) <= 1
      if variants(a).intersect(variants(b)).exists(surviving)
    } yield if (a < b) (a, b) else (b, a)).toSet
  }

  private val sweepSeeds = Seq(42L, 7L, 1337L, 2026L, 99L)

  test("hot-variant draw past the cap: the default path raises, never truncates") {
    import spark.implicits._
    sweepSeeds.foreach { seed =>
      val rows = corpus(seed, hot = 12, bg = 40)
      val strings = rows.toDF("id", "name")
      val e = intercept[Exception] {
        Dedup.editDistPairs(strings, bucketCap = 8).count()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("overflowed cap")),
        s"seed $seed: expected the fail-loud bucket-overflow raise, got: ${e.getMessage}")
    }
  }

  test("failOnOverflow=false loses exactly the all-buckets-overflowed pairs") {
    import spark.implicits._
    sweepSeeds.foreach { seed =>
      val rows = corpus(seed, hot = 12, bg = 40)
      val cap = 8
      val got = Dedup.editDistPairs(rows.toDF("id", "name"),
        bucketCap = cap, failOnOverflow = false)
        .select("name_a", "name_b").collect()
        .map(r => (r.getString(0), r.getString(1)))
        .map { case (a, b) => if (a < b) (a, b) else (b, a) }.toSet
      val want = expectedPairs(rows, cap)
      assert(got === want, s"seed $seed: degraded-mode pair set diverged " +
        "from the documented surviving-bucket expectation")
      // the draw is only adversarial if it actually exercised both sides:
      // the hot cluster must have LOST its pairs, the planted background
      // pairs must have SURVIVED
      val all = (for { (ia, a) <- rows; (ib, b) <- rows if ia < ib && lev(a, b) <= 1 }
        yield if (a < b) (a, b) else (b, a)).toSet
      assert(want.size < all.size, s"seed $seed: no pair was capped away — the draw is not adversarial")
      assert(want.nonEmpty, s"seed $seed: every pair was capped away — the draw has no surviving signal")
    }
  }
}
