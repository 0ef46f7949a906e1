package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.Tables.SpreadOps

/** C19/C20 — byte-pair-encoding tokenizer TRAINING and ENCODING (Sennrich
  * et al. 2016, arXiv:1508.07909 — the algorithm behind GPT-2/RoBERTa
  * vocabularies), structured the way production tokenizer training is:
  *
  *  1. ONE distributed pass builds the word-frequency dictionary — the only
  *     corpus-sized work (explode → groupBy(word) → count, one shuffle).
  *  2. The merge loop runs driver-local over the BOUNDED top-K dictionary
  *     (cnt-desc/word-asc TakeOrdered, deterministic cut). Vocabulary
  *     learning is sublinear in corpus size by construction: at 100 TB the
  *     dictionary cap — not the corpus — bounds the loop, exactly like
  *     [[graft.similarity.Similarity.kmeansCentroids]]'s bounded sample.
  *  3. Encoding applies the learned merge ranks per document distributedly
  *     (mapPartitions; the merge table is a few KB riding in the closure).
  *     The per-word merge loop is genuinely iterative — the documented
  *     case where mapPartitions beats torturing built-ins (C20 surface).
  *
  * Determinism: pair counts are exact longs; the argmax tie-break is
  * (count desc, left asc, right asc); the dictionary cut is a total order.
  * Same corpus → same merges → same token counts, on any partitioning.
  */
object Bpe {

  /** Distributed word-frequency dictionary (lowercased whitespace words). */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Deterministic top-K dictionary cut: cnt desc, word asc. */
  def boundedDict(docs: DataFrame, cap: Int): Array[(String, Long)] = {
    import docs.sparkSession.implicits._
    wordCounts(docs)
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(cap)
      .as[(String, Long)].collect()
  }

  /** Driver-local merge learning over the bounded dictionary. Each word is
    * a symbol sequence (single chars initially); every round counts all
    * adjacent symbol pairs weighted by word frequency, merges the most
    * frequent pair everywhere (left-to-right, non-overlapping), and stops
    * at `numMerges` or when no pair repeats. */
  def trainMerges(dict: Array[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      dict.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (best, n) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        if (n < 2) done = true // a pair seen once carries no compression
        else {
          merges += best
          words = words.map { case (syms, c) =>
            val out = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += best._1 + best._2; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), c)
          }
        }
      }
      round += 1
    }
    merges.result()
  }

  /** Apply learned merges to one word: repeatedly merge the present pair
    * with the LOWEST merge rank (the standard BPE encode order — identical
    * output to replaying training merges in sequence). */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var continue = syms.length >= 2
    while (continue) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0 || bestRank == Int.MaxValue) continue = false
      else {
        val (l, r) = (syms(bestIdx), syms(bestIdx + 1))
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            out += l + r; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        continue = syms.length >= 2
      }
    }
    syms
  }

  val dictCap = 4096
  val numMerges = 50

  /** The learned merge table over `documents` — rank, pair, merged symbol.
    * noOracle: a learned vocabulary has no SQL equivalent; BpeSpec pins the
    * algorithm on the textbook corpus and determinism on real data. */
  val bpeTrain: QueryDef = QueryDef.noOracle("c19_bpe_train", "C19 C20") { (s, d) =>
    import s.implicits._
    val merges = trainMerges(boundedDict(Tables.documents(s, d), dictCap), numMerges)
    merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r, l + r) }
      .toDF("rank", "left", "right", "merged")
      .orderBy("rank")
  }

  /** Per-document token count under the LEARNED vocabulary (vs the char
    * count it compresses): train once on the bounded dictionary, broadcast
    * the merge ranks inside the closure, encode distributedly. */
  val bpeEncode: QueryDef = QueryDef.noOracle("c19_bpe_encode", "C19 C20") { (s, d) =>
    import s.implicits._
    val ranks: Map[(String, String), Int] =
      trainMerges(boundedDict(Tables.documents(s, d), dictCap), numMerges)
        .zipWithIndex.toMap
    // repartition before the encode: the per-word merge loop is the CPU
    // stage, and a single-row-group scan would otherwise run it in one task
    Tables.documents(s, d)
      .spreadByKey(col("doc_id"))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val words = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          val nTokens = words.map(w => encodeWord(w, ranks).length).sum
          val nChars = words.map(_.length).sum
          (id, nTokens, nChars)
        }
      }
      .toDF("doc_id", "n_bpe_tokens", "n_word_chars")
      .orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(bpeTrain, bpeEncode)
}
