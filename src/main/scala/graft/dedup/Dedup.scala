package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}

/** C17 — deduplication operators over `documents` (LLM-pipeline pillar).
  *
  * Exact dedup is a hash group-by on a content fingerprint. Near-dup is
  * MinHash + LSH banding: shingle → k minhashes → b bands → bucket join —
  * candidates only ever meet inside a band bucket, NEVER all-pairs, so the
  * cost is O(n·k) map-side plus one shuffle on (band, bandHash). SimHash is
  * the bit-vector analogue with chunk-match candidate generation.
  *
  * All signature computation uses Spark higher-order functions
  * (`transform`/`aggregate`/`sequence`) over codegen'd hash primitives
  * (`hash` = murmur3, `xxhash64`) — one narrow projection per doc, no UDFs,
  * no driver-side loops. At 100 TB the only shuffles are the band-bucket
  * join and the final candidate verification join, both on uniformly
  * hash-distributed keys.
  */
object Dedup {

  /** Exact-dedup summary: content fingerprint → multiplicity + survivor id. */
  val exact: QueryDef = QueryDef(
    "c17_dedup_exact", "C17",
    """SELECT md5(text) AS fp, count(*) AS cnt, min(doc_id) AS keep_id
      |FROM documents GROUP BY md5(text) ORDER BY fp""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("fp"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keep_id"))
      .orderBy("fp")
  }

  /** Exact-dedup survivors: first doc_id per content fingerprint. Uses a
    * min-per-group + semi-join (aggregate, not window) so the heavy table is
    * shuffled once on the fingerprint — the canonical scale shape. */
  val keepFirst: QueryDef = QueryDef(
    "c17_dedup_keep_first", "C17",
    """SELECT doc_id, lang, source, n_chars FROM documents
      |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val keep = docs
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    docs.join(keep, Seq("doc_id"), "left_semi")
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** Word 3-gram shingle array (lowercased, whitespace-tokenized); documents
    * shorter than 3 tokens fall back to the whole text as one shingle. */
  def shingles(text: Column): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    val grams = transform(
      sequence(lit(0), size(toks) - lit(3)),
      i => concat_ws(" ",
        element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3)))
    array_distinct(when(size(toks) >= 3, grams).otherwise(array(trim(lower(text)))))
  }

  /** k minhash values per doc: minhash_i = min over shingles of
    * murmur3(shingle, i) — seeding by mixing the permutation index into the
    * hash input, all inside one `transform`, no explode. */
  def minhashes(shingleCol: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleCol, sh => hash(sh, i))))

  /** MinHash-LSH near-duplicate pairs: k=64 minhashes, 16 bands × 4 rows,
    * band-bucket join for candidates, exact shingle-set Jaccard verification,
    * threshold 0.7. No oracle (murmur3 signatures are engine-specific);
    * spec-tested in DedupSpec with planted near-dups.
    */
  val minhashLsh: QueryDef = QueryDef.noOracle("c17_minhash_lsh", "C17") { (s, d) =>
    minhashPairs(Tables.documents(s, d), k = 64, bands = 16, threshold = 0.7)
      .orderBy("doc_a", "doc_b")
  }

  /** Reusable MinHash-LSH pipeline: documents(doc_id, text) → verified
    * near-dup pairs (doc_a < doc_b, exact jaccard >= threshold). */
  def minhashPairs(docs: DataFrame, k: Int, bands: Int, threshold: Double): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rowsPerBand = k / bands
    val sig = docs.select(
      col("doc_id"),
      shingles(col("text")).as("sh"))
      .withColumn("mh", minhashes(col("sh"), k))
    // One row per (doc, band): band key = murmur3 of the band's minhash slice.
    val banded = sig.select(
      col("doc_id"), col("sh"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("mh"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
    val a = banded.select(
      col("band"), col("band_hash"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(
      col("band"), col("band_hash"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "band_hash"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b")
      .dropDuplicates("doc_a", "doc_b") // candidates colliding in >1 band
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 64-bit SimHash per document from word tokens: bit i is the sign of the
    * sum over tokens of ±1 according to bit i of xxhash64(token). */
  def simhash(text: Column): Column = {
    val toks = array_distinct(split(trim(lower(text)), "\\s+"))
    val bits = transform(
      sequence(lit(0), lit(63)),
      i =>
        when(
          aggregate(toks, lit(0),
            (acc, t) => acc +
              when(call_function("shiftright", xxhash64(t), i).bitwiseAND(lit(1L)) === 1L, lit(1))
                .otherwise(lit(-1))) >= 0,
          lit(1L)).otherwise(lit(0L)))
    aggregate(
      zip_with(bits, sequence(lit(0), lit(63)), (bit, i) => call_function("shiftleft", bit, i)),
      lit(0L), (acc, v) => acc.bitwiseXOR(v))
  }

  /** SimHash near-dup candidates: 4 chunks of 16 bits; docs sharing any
    * chunk are candidates; keep pairs with hamming distance <= 6. noOracle
    * (engine-specific bit signatures); spec-tested. */
  val simhashPairs: QueryDef = QueryDef.noOracle("c17_simhash", "C17") { (s, d) =>
    val sigs = Tables.documents(s, d)
      .select(col("doc_id"), simhash(col("text")).as("sig"))
    val chunked = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(transform(
        sequence(lit(0), lit(3)),
        c => call_function("shiftrightunsigned", col("sig"), c * 16).bitwiseAND(lit(0xFFFFL)))))
      .withColumnsRenamed(Map("pos" -> "chunk", "col" -> "chunk_val"))
    val a = chunked.select(
      col("chunk"), col("chunk_val"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = chunked.select(
      col("chunk"), col("chunk_val"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk", "chunk_val"))
      .where(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= 6)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard over a bounded candidate set (same `source`
    * partition — the blocking key): the brute-force verifier used when the
    * block is small enough to pair exhaustively. noOracle; spec-tested. */
  val ngramJaccard: QueryDef = QueryDef.noOracle("c17_ngram_jaccard", "C17") { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), shingles(col("text")).as("sh"))
    val a = docs.select(
      col("source"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docs.select(
      col("source"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("source"))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= 0.2)
      .select("source", "doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  val all: Seq[QueryDef] =
    Seq(exact, keepFirst, minhashLsh, simhashPairs, ngramJaccard)
}
