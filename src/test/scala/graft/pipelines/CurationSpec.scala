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

  test("PII redaction removes every injected email, phone, and IP") {
    import spark.implicits._
    // independent check: rebuild the redacted text (not just its md5) and
    // assert no PII patterns survive
    val docs = graft.Tables.documents(spark, sf)
    val redacted = docs.select(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            concat(col("text"), lit(" contact u"), col("doc_id").cast("string"),
              lit("@mail.example.com or call 555-0142 ip 10.0.3.7")),
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
          "\\b[0-9]{3}-[0-9]{4}\\b", "<PHONE>"),
        "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>").as("t"))
      .as[String].collect()
    assert(redacted.nonEmpty)
    redacted.foreach { t =>
      assert(!t.contains("@mail.example.com") && !t.contains("555-01") && !t.contains("10.0."))
      assert(t.contains("<EMAIL>") && t.contains("<PHONE>") && t.contains("<IP>"))
    }
    val out = Curation.piiRedact.fn(spark, sf)
    assert(out.where(col("n_emails") < 1).count() === 0) // every doc had its injected email found
  }

  test("decontamination flags only non-benchmark docs and benchmark overlap is real") {
    val out = Curation.decontaminate.fn(spark, sf).collect()
    out.foreach(r => assert(r.getLong(0) % 100 !== 0L)) // benchmark docs never flag themselves
    out.foreach(r => assert(r.getInt(1) >= 3))
  }

  test("train/val split is deterministic, content-independent, and ~5% val") {
    val out = Curation.trainValSplit.fn(spark, sf).collect()
    val again = Curation.trainValSplit.fn(spark, sf).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      again.map(r => (r.getLong(0), r.getString(1))).toSeq)
    val valFrac = out.count(_.getString(1) == "val").toDouble / out.length
    assert(valFrac > 0.0 && valFrac < 0.15) // 13/256 ≈ 5.1% expected
  }

  test("repetition score is 0 for all-distinct tokens and high for repeated text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "spam spam spam spam spam spam"))
      .toDF("doc_id", "text")
    val toks = split(trim(lower(col("text"))), "\\s+")
    val out = docs.select(col("doc_id"),
      (lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks)).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) === 0.0)
    assert(out(2L) > 0.8)
  }

  test("stratified sample keeps the downweighted source at a lower rate") {
    val out = Curation.stratifiedSample.fn(spark, sf)
    val rates = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = graft.Tables.documents(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val downweighted = rates.getOrElse("src0", 0L).toDouble / total("src0")
    val others = (rates.keySet - "src0").map(k => rates(k).toDouble / total(k))
    assert(downweighted < 0.5)           // ~25% target
    assert(others.forall(_ > 0.5))       // ~75% target
  }

  test("registered curation query is non-trivial on the testdata") {
    val out = Curation.curateDocs.fn(spark, sf)
    val n = out.count()
    val total = graft.Tables.documents(spark, sf).count()
    assert(n > 0 && n < total) // the gates actually select
  }

  test("bloom-gated decontamination equals the exact baseline") {
    val exact = Curation.decontaminate.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val bloom = Curation.decontaminateBloom.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(exact.nonEmpty)
    assert(bloom === exact) // probe only pre-gates; the join removes FPs
  }

  test("sequence packing assigns contiguous offsets and spans pack boundaries") {
    import spark.implicits._
    // 3 docs of 6 tokens in one source, budget 10: doc 2 starts at offset 6
    // and spans the 10-token boundary into pack 1; doc 3 starts in pack 1.
    val docs = Seq(
      (1L, "s", "a b c d e f"),
      (2L, "s", "g h i j k l"),
      (3L, "s", "m n o p q r"),
      (4L, "t", "lone doc in its own source stream"))
      .toDF("doc_id", "source", "text")
    val out = Curation.pack(docs, budget = 10).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getInt(5)))).toMap
    assert(out(1L) === ((0L, 0L, 1)))  // fits pack 0
    assert(out(2L) === ((0L, 6L, 2)))  // starts pack 0 offset 6, spans into 1
    assert(out(3L) === ((1L, 2L, 1)))  // continues pack 1
    assert(out(4L) === ((0L, 0L, 1)))  // other source packs independently
  }

  test("chunking covers the text with the declared overlap and a short tail") {
    import spark.implicits._
    val text = ("x" * 950) + "END"     // 953 chars
    val docs = Seq((1L, text), (2L, "short")).toDF("doc_id", "text")
    val out = Curation.chunk(docs, size = 500, stride = 400)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // 953 chars, size 500 stride 400 → chunks at 0, 400, 800 (tail 153)
    assert(d1.map(_.getInt(1)).toSeq === Seq(0, 1, 2))
    assert(d1.map(_.getInt(2)).toSeq === Seq(0, 400, 800))
    assert(d1.map(_.getInt(3)).toSeq === Seq(500, 500, 153))
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length === 1 && d2.head.getInt(3) === 5)
    // coverage: last chunk reaches the end of the text (800 + 153 = 953)
    assert(d1.last.getInt(2) + d1.last.getInt(3) === text.length)
  }

  test("winsorize clips outliers into the per-source band and keeps every row") {
    val out = graft.Registry.queries("pipeline_winsorize")(spark, sf)
      .select("n_tokens", "w_tokens", "clipped").collect()
    val total = graft.Tables.documents(spark, sf).count()
    assert(out.length.toLong === total, "winsorize must keep every row")
    out.foreach { r =>
      val (n, w, c) = (r.getInt(0).toDouble, r.getDouble(1), r.getBoolean(2))
      if (c) assert(w !== n) else assert(w === n)
    }
    // p05/p95 clipping must actually fire on both tails of real data
    assert(out.count(_.getBoolean(2)) > 0, "no clipping happened — vacuous")
    assert(out.exists(r => r.getBoolean(2) && r.getDouble(1) > r.getInt(0)),
      "no low-tail clip (w > n) found")
    assert(out.exists(r => r.getBoolean(2) && r.getDouble(1) < r.getInt(0)),
      "no high-tail clip (w < n) found")
  }

  test("token budget keeps best-quality docs first and never overruns per source") {
    val out = graft.Registry.queries("pipeline_token_budget")(spark, sf)
      .select("source", "n_tokens", "quality", "cum_tokens").collect()
    assert(out.nonEmpty)
    // never overruns, and the running sum is consistent per source
    assert(out.forall(_.getLong(3) <= 800L))
    val total = graft.Tables.documents(spark, sf).count()
    assert(out.length.toLong < total, "budget must actually cut something")
    // within each source, kept docs sorted by quality desc have the
    // running sums this cut was computed from: max cum == sum of kept
    out.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val kept = rows.map(_.getInt(1).toLong).sum
      assert(rows.map(_.getLong(3)).max === kept,
        s"$src: running-sum inconsistency")
    }
  }

  test("importance thinning keeps docs proportionally to weight, deterministically") {
    val q = graft.Registry.queries("pipeline_importance_thin")
    val kept1 = q(spark, sf).collect().map(_.getLong(0)).toSet
    val kept2 = q(spark, sf).collect().map(_.getLong(0)).toSet
    assert(kept1 === kept2) // hash-deterministic, no RNG state
    assert(kept1.nonEmpty)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), least(col("n_chars"), lit(2000)).as("wt")).collect()
    assert(kept1.size < docs.length, "thinning must actually drop rows")
    // empirical keep rate must grow with weight: split at the median weight
    val wts = docs.map(_.getLong(1)).sorted
    val medw = wts(wts.length / 2)
    val (hi, lo) = docs.partition(_.getLong(1) > medw)
    def rate(rows: Array[org.apache.spark.sql.Row]) =
      if (rows.isEmpty) 0.0
      else rows.count(r => kept1(r.getLong(0))).toDouble / rows.length
    assert(rate(hi) > rate(lo),
      s"high-weight keep rate ${rate(hi)} must exceed low-weight ${rate(lo)}")
  }

  test("pipeline and dedup helpers tolerate empty input (empty partitions are routine at scale)") {
    val empty = graft.Tables.documents(spark, sf).limit(0)
    assert(Curation.curate(empty, 20, 5000, 0.8).count() === 0L)
    assert(graft.text.TextAnalysis.gopherMetrics(empty).count() === 0L)
    assert(graft.text.TextAnalysis.typicality(empty).count() === 0L)
    assert(graft.dedup.Dedup.spanDedupPairs(empty, 16, 64).count() === 0L)
    assert(graft.dedup.Dedup.ngramJaccardPairs(empty, 0.7, 64).count() === 0L)
    assert(graft.dedup.Dedup.minhashPairs(empty, 64, 16, 0.7).count() === 0L)
    assert(graft.text.Bpe.trainMerges(graft.text.Bpe.boundedDict(empty, 100), 10) === Seq.empty)
  }
}
