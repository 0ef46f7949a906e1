package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the BPE trainer on a hand-computable corpus and determinism /
  * consistency on real data. */
class BpeSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("trainer learns the hand-computed merges on the textbook corpus") {
    // word frequencies: hug x10, pug x5, pun x12, bun x4, hugs x5
    // pair counts round 1: (u,g)=10+5+5=20 (max), (h,u)=15, (p,u)=17,
    // (u,n)=16, (b,u)=4, (g,s)=5 -> merge (u,g)
    // round 2: pug=p|ug, hug=h|ug, hugs=h|ug|s: (p,u)=12, (u,n)=16 (max),
    // (h,ug)=15, (p,ug)=5, (b,u)=4, (ug,s)=5 -> merge (u,n)
    val corpus = docs(
      (1L, Array.fill(10)("hug").mkString(" ")),
      (2L, Array.fill(5)("pug").mkString(" ")),
      (3L, Array.fill(12)("pun").mkString(" ")),
      (4L, Array.fill(4)("bun").mkString(" ")),
      (5L, Array.fill(5)("hugs").mkString(" ")))
    val dict = Bpe.boundedDict(corpus, cap = 100)
    assert(dict.toMap === Map("hug" -> 10L, "pug" -> 5L, "pun" -> 12L,
      "bun" -> 4L, "hugs" -> 5L))
    val merges = Bpe.trainMerges(dict, numMerges = 2)
    assert(merges === Seq(("u", "g"), ("u", "n")))
  }

  test("encodeWord replays the learned merges exactly") {
    val ranks = Map(("u", "g") -> 0, ("u", "n") -> 1, ("h", "ug") -> 2)
    assert(Bpe.encodeWord("hug", ranks).toSeq === Seq("hug"))
    assert(Bpe.encodeWord("pug", ranks).toSeq === Seq("p", "ug"))
    assert(Bpe.encodeWord("pun", ranks).toSeq === Seq("p", "un"))
    assert(Bpe.encodeWord("hugs", ranks).toSeq === Seq("hug", "s"))
    assert(Bpe.encodeWord("x", ranks).toSeq === Seq("x"))
  }

  test("merges stop when no pair repeats") {
    val dict = Array(("ab", 1L), ("cd", 1L))
    assert(Bpe.trainMerges(dict, numMerges = 10) === Seq.empty)
  }

  test("replay encode == fixpoint encode over the full corpus vocabulary") {
    // the c19_bpe_encode oracle unrolls the REPLAY form (apply merges in
    // training order); the Spark side runs the lowest-rank-first FIXPOINT.
    // They diverge only when two merge paths collide on a symbol string
    // (encodeWordReplay scaladoc) — pin that this corpus' merges don't,
    // over every distinct word the registered query actually encodes
    val docsDf = graft.Tables.documents(spark, sf)
    val merges = Bpe.trainMerges(Bpe.boundedDict(docsDf, Bpe.dictCap), Bpe.numMerges)
    val ranks = merges.zipWithIndex.toMap
    import spark.implicits._
    val vocab = docsDf
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .where(col("word") =!= "").distinct().as[String].collect()
    assert(vocab.nonEmpty)
    vocab.foreach { w =>
      assert(Bpe.encodeWord(w, ranks).toSeq === Bpe.encodeWordReplay(w, merges).toSeq,
        s"replay/fixpoint divergence on '$w' — the corpus learned " +
          "string-colliding merges; the encode oracle's replay premise broke")
    }
  }

  test("replay diverges from fixpoint exactly on string-colliding merges") {
    // the documented boundary case, kept as a living counter-example:
    // ranks 2 ("a","bc") and 4 ("ab","c") both mint the symbol string
    // "abc". On "dabc" the fixpoint goes d|ab|c (rank 0), d|abc (rank 4),
    // then takes the rank-3 ("d","abc") the late collision just created →
    // [dabc]; the replay's rank-3 pass already ran before "abc" existed,
    // so it ends at [d, abc]. If an engine change ever makes these equal,
    // the oracle's premise documentation is stale — revisit
    // encodeWordReplay's scaladoc
    val merges = Seq(("a", "b"), ("b", "c"), ("a", "bc"), ("d", "abc"), ("ab", "c"))
    val ranks = merges.zipWithIndex.toMap
    assert(Bpe.encodeWordReplay("dabc", merges).toSeq === Seq("d", "abc"))
    assert(Bpe.encodeWord("dabc", ranks).toSeq === Seq("dabc"))
  }

  test("the collision guard fires on planted string-colliding merges") {
    // round-17 directive: the oracle identity's boundary is CHECKED in the
    // registered query, not just pinned here — prove the guard actually
    // fires on the exact counter-example the identity breaks on
    val planted = Seq(("a", "b"), ("b", "c"), ("a", "bc"), ("d", "abc"), ("ab", "c"))
    val e = intercept[IllegalArgumentException] {
      Bpe.requireNoMergeCollisions(planted)
    }
    assert(e.getMessage.contains("abc") && e.getMessage.contains("replay"),
      s"guard fired with an undiagnostic message: ${e.getMessage}")
    // a duplicate of the SAME pair is not a collision (same merge path) —
    // the guard must not fire on it
    Bpe.requireNoMergeCollisions(Seq(("a", "b"), ("a", "b")))
  }

  test("the real corpus' learned merges pass the collision guard") {
    val merges = Bpe.trainMerges(
      Bpe.boundedDict(graft.Tables.documents(spark, sf), Bpe.dictCap), Bpe.numMerges)
    Bpe.requireNoMergeCollisions(merges) // throws = this corpus broke the premise
  }

  test("registered train/encode queries are deterministic and consistent on real data") {
    val m1 = Bpe.bpeTrain.fn(spark, sf).collect().map(_.toString).toSeq
    val m2 = Bpe.bpeTrain.fn(spark, sf).collect().map(_.toString).toSeq
    assert(m1 === m2)
    // the oracle's fixed-unroll premise (bpeTrainOracleSql scaladoc): the
    // corpus must sustain all numMerges rounds or the row counts diverge —
    // pin it at spec scale (the gate corpora are verified by the gates)
    assert(m1.size === Bpe.numMerges,
      s"corpus dried up at ${m1.size}/${Bpe.numMerges} merges — the " +
        "c19_bpe_train oracle emits exactly numMerges rows by construction")
    val enc = Bpe.bpeEncode.fn(spark, sf).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val (tokens, chars) = (r.getInt(1), r.getInt(2))
      // merges only ever compress: chars >= bpe tokens >= 1 per non-empty doc
      assert(tokens <= chars && tokens > 0, s"doc ${r.getLong(0)}: $tokens vs $chars")
    }
  }
}
