package graft.fuzz

import java.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.fuzz.QueryGen.FuzzQuery

/** Parameter fuzz for the dedup/similarity/text pipelines (round-14
  * verdict directive 6): where [[QueryGen]] composes random RELATIONAL
  * drafts, this generator re-runs the exact-arithmetic dedup pipelines
  * under RANDOM PARAMETERS — shingle/window size, band/row (chunk)
  * splits, df caps, SRP bit width, IVF cluster/iteration/probe counts —
  * each draw paired with the equivalently-parameterized DuckDB SQL, so
  * the md5-anchored derivations are hash-checked across their parameter
  * space instead of only at the registered operating point.
  *
  * Only the EXACT families are drawn (md5/integer anchors + the
  * cap-mirrored ngram/span pipelines): their oracles hold for any
  * parameter value. The probabilistic families (minhash band recall,
  * float SRP) are deliberately excluded — under random band/row splits
  * an exact-equality oracle legitimately fails on near-threshold pairs,
  * which is the documented LSH trade, not a bug (see the c17_minhash_lsh
  * scaladoc); their parameter behavior is spec-territory, not
  * hash-compare territory.
  *
  * Same determinism contract as QueryGen: `java.util.Random`'s specified
  * LCG makes the draw list a pure function of the seed (FuzzSpec pins
  * the seed-42 SQL hash).
  */
object DedupParamGen {

  /** Generate `n` paired parameter draws from `seed`. Pure function of
    * its arguments — FuzzSpec pins this. */
  def generate(seed: Long, n: Int): Seq[FuzzQuery] = {
    val r = new Random(seed ^ 0x5eedd00dL) // decouple from QueryGen's stream
    (0 until n).map { i =>
      val name = f"fzd_$i%03d"
      r.nextInt(8) match {
        case 0 => spanDraw(r, name)
        case 1 => ngramDraw(r, name)
        case 2 => simhashDraw(r, name)
        case 3 => srpDraw(r, name)
        case 4 => winnowDraw(r, name)
        case 5 => ivfDraw(r, name)
        case 6 => semanticDraw(r, name)
        case _ => pqDraw(r, name)
      }
    }
  }

  /** Span dedup under random window size k and df cap — the "shingle
    * size" and "df cap" axes. Oracle = the registered c17_span_dedup SQL
    * with both constants templated. */
  private def spanDraw(r: Random, name: String): FuzzQuery = {
    val k = 4 + r.nextInt(17) // 4..20 tokens per window
    val cap = 3 + r.nextInt(14) // 3..16 docs per window
    val sql =
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, len(t) - ${k - 2}),
        |      i -> array_to_string(t[i:i+${k - 1}], ' ')))) AS g
        |  FROM toks WHERE len(t) >= $k
        |), df AS (SELECT g, count(*) AS df FROM grams GROUP BY g
        |), keep AS (
        |  SELECT gr.doc_id, gr.g FROM grams gr JOIN df USING (g) WHERE df.df <= $cap)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS INT) AS shared_spans
        |FROM keep a JOIN keep b ON a.g = b.g AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin
    FuzzQuery(name, sql, (s, d) =>
      graft.dedup.Dedup.spanDedupPairs(Tables.documents(s, d), k, cap)
        .orderBy("doc_a", "doc_b"))
  }

  /** Capped n-gram Jaccard under random threshold and df cap. Both
    * engines compute jaccard as the same integer division, so the
    * threshold cut is IEEE-identical at any drawn value. */
  private def ngramDraw(r: Random, name: String): FuzzQuery = {
    val cap = 8 + r.nextInt(89) // 8..96 docs per gram
    val threshold = (5 + r.nextInt(46)) / 100.0 // 0.05..0.50
    val sql =
      s"""WITH toks AS (
        |  SELECT doc_id, source, regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM documents
        |), sh AS (
        |  SELECT doc_id, source,
        |    list_distinct(CASE WHEN len(t) >= 3
        |      THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |      ELSE [array_to_string(t, ' ')] END) AS grams
        |  FROM toks
        |), sizes AS (SELECT doc_id, len(grams) AS n FROM sh
        |), gr AS (SELECT source, doc_id, unnest(grams) AS g FROM sh
        |), df AS (SELECT source, g, count(*) AS df FROM gr GROUP BY 1, 2
        |), gp AS (
        |  SELECT gr.source, gr.doc_id, gr.g
        |  FROM gr JOIN df ON gr.source = df.source AND gr.g = df.g
        |  WHERE df.df <= $cap
        |), inter AS (
        |  SELECT a.source AS source, a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM gp a JOIN gp b ON a.source = b.source AND a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3)
        |SELECT source, doc_a, doc_b,
        |  CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
        |FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= $threshold
        |ORDER BY doc_a, doc_b""".stripMargin
    FuzzQuery(name, sql, (s, d) =>
      graft.dedup.Dedup.ngramJaccardPairs(Tables.documents(s, d), threshold, cap)
        .orderBy("doc_a", "doc_b"))
  }

  /** md5-simhash under a random band/row split of the 64-bit signature
    * (8/16/32-bit chunks), random bucket cap and random hamming flag
    * threshold — the generic chunked pairing over
    * [[graft.dedup.Dedup.simhashMd5Chunks]]. */
  private def simhashDraw(r: Random, name: String): FuzzQuery = {
    val bpc = Seq(8, 16, 32)(r.nextInt(3))
    val cap = Seq(16, 32, 64, 128)(r.nextInt(4))
    val hmax = 1 + r.nextInt(6) // 1..6
    val sql =
      s"""WITH toks AS (
        |  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
        |  FROM documents),
        |nib AS (
        |  SELECT doc_id, CAST(i AS INT) AS i,
        |    strpos('0123456789abcdef', substr(md5(tok), CAST(i + 1 AS INT), 1)) - 1 AS v
        |  FROM toks, unnest(range(0, 16)) t(i)),
        |agg AS (
        |  SELECT doc_id, i, count(*) AS n,
        |    sum((v >> 0) & 1) AS c0, sum((v >> 1) & 1) AS c1,
        |    sum((v >> 2) & 1) AS c2, sum((v >> 3) & 1) AS c3
        |  FROM nib GROUP BY doc_id, i),
        |bits AS (
        |  SELECT doc_id, i, j, CASE WHEN 2 * c - n >= 0 THEN 1 ELSE 0 END AS bit
        |  FROM (SELECT doc_id, i, n, unnest([c0, c1, c2, c3]) AS c,
        |               unnest([0, 1, 2, 3]) AS j FROM agg)),
        |chunks AS (
        |  SELECT doc_id, CAST((i * 4 + j) // $bpc AS INT) AS c,
        |    CAST(sum(bit * (CAST(1 AS BIGINT) << ((i * 4 + j) % $bpc))) AS BIGINT) AS chunk_val
        |  FROM bits GROUP BY doc_id, (i * 4 + j) // $bpc),
        |small AS (
        |  SELECT c, chunk_val FROM chunks GROUP BY c, chunk_val HAVING count(*) <= $cap),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM chunks a JOIN small USING (c, chunk_val)
        |       JOIN chunks b USING (c, chunk_val)
        |  WHERE a.doc_id < b.doc_id),
        |ham AS (
        |  SELECT cand.doc_a, cand.doc_b,
        |    CAST(SUM(bit_count(xor(ca.chunk_val, cb.chunk_val))) AS INT) AS hamming
        |  FROM cand JOIN chunks ca ON ca.doc_id = cand.doc_a
        |       JOIN chunks cb ON cb.doc_id = cand.doc_b AND cb.c = ca.c
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, hamming, hamming <= $hmax AS is_dup
        |FROM ham ORDER BY doc_a, doc_b""".stripMargin
    FuzzQuery(name, sql, (s, d) => {
      val chunks = graft.dedup.Dedup
        .simhashMd5Chunks(Tables.documents(s, d), bpc)
        .localCheckpoint(false) // 3 consumers: cap filter + both join sides
      val small = chunks.groupBy("c", "chunk_val")
        .agg(count(lit(1)).as("bsz")).where(col("bsz") <= cap)
        .select("c", "chunk_val")
      val pruned = chunks.join(small, Seq("c", "chunk_val"))
      val cand = pruned.select(col("c"), col("chunk_val"), col("doc_id").as("doc_a"))
        .join(pruned.select(col("c"), col("chunk_val"), col("doc_id").as("doc_b")),
          Seq("c", "chunk_val"))
        .where(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      cand
        .join(chunks.select(col("doc_id").as("doc_a"), col("c"), col("chunk_val").as("va")),
          Seq("doc_a"))
        .join(chunks.select(col("doc_id").as("doc_b"), col("c"), col("chunk_val").as("vb")),
          Seq("doc_b", "c"))
        .groupBy("doc_a", "doc_b")
        .agg(sum(bit_count(col("va").bitwiseXOR(col("vb")))).cast(IntegerType).as("hamming"))
        .withColumn("is_dup", col("hamming") <= hmax)
        .orderBy("doc_a", "doc_b")
    })
  }

  /** md5-Rademacher SRP bucket assignment under random bit width — the
    * c18_ann_lsh_md5 bucket CTEs with `planes` templated; output is the
    * full (vec_id, bucket) map. */
  private def srpDraw(r: Random, name: String): FuzzQuery = {
    val planes = 4 + r.nextInt(9) // 4..12 sign bits
    val sql =
      s"""WITH dims AS (
        |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS d,
        |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
        |  FROM embeddings
        |), weights AS (
        |  SELECT CAST(p AS INT) AS p, CAST(d AS INT) AS d,
        |    CASE WHEN substr(md5(CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)), 1, 1)
        |      IN ('0','2','4','6','8','a','c','e') THEN 1 ELSE -1 END AS w
        |  FROM range($planes) t1(p), range(64) t2(d)
        |), dots AS (
        |  SELECT vec_id, p, SUM(w * q) AS dot
        |  FROM dims JOIN weights USING (d) GROUP BY 1, 2
        |)
        |SELECT vec_id, CAST(SUM(CASE WHEN dot >= 0 THEN 1 << p ELSE 0 END) AS INT) AS bucket
        |FROM dots GROUP BY 1 ORDER BY vec_id""".stripMargin
    FuzzQuery(name, sql, (s, d) =>
      graft.similarity.Similarity
        .md5Buckets(Tables.embeddings(s, d).select(col("vec_id"), col("embedding")), planes)
        .orderBy("vec_id"))
  }

  /** Winnow md5 fingerprint selection under random character-gram length —
    * the window-min machinery hash-checked at gram sizes other than the
    * registered 8. */
  private def winnowDraw(r: Random, name: String): FuzzQuery = {
    val k = 4 + r.nextInt(13) // 4..16 chars per gram
    val sql =
      s"""WITH g AS (
        |  SELECT doc_id, md5(substr(norm, CAST(i AS INT), $k)) AS h
        |  FROM (SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm
        |        FROM documents),
        |       unnest(range(1, greatest(length(norm) - ${k - 1}, 1) + 1)) t(i))
        |SELECT doc_id,
        |  min(substr(h, 1, 8)) AS fp0, min(substr(h, 9, 8)) AS fp1,
        |  min(substr(h, 17, 8)) AS fp2, min(substr(h, 25, 8)) AS fp3
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin
    FuzzQuery(name, sql, (s, d) =>
      graft.text.TextAnalysis
        .winnowMd5Fingerprints(Tables.documents(s, d), k).orderBy("doc_id"))
  }

  /** One integer-L2 argmin/top-`keep` assignment subquery against the
    * centroid CTE `cents`, over the shared `dims` CTE (optionally
    * restricted by `filter`, e.g. to the training sample). */
  private def assignSql(cents: String, filter: String, keep: Int): String =
    s"""SELECT vec_id, c FROM (
      |    SELECT dm.vec_id, ct.c, SUM((dm.q - ct.val) * (dm.q - ct.val)) AS dist
      |    FROM dims dm $filter JOIN $cents ct USING (d)
      |    GROUP BY 1, 2)
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, c) <= $keep""".stripMargin

  /** The unrolled coarse integer-Lloyd CTE chain over the `dims`/`sample`
    * CTEs, to the drawn depth: returns ("assign1 AS …, cents$iters AS …",
    * final centroid CTE name). Shared by the IVF, IVF-PQ and SemDeDup
    * draws — each mirrors one registered twin's oracle with the Lloyd
    * unrolling driven by the drawn iteration count instead of the
    * registered 2. */
  private def lloydCtes(iters: Int): (String, String) = {
    val ctes = (1 to iters).map { it =>
      s"""assign$it AS (
        |  ${assignSql(s"cents${it - 1}", "JOIN sample USING (vec_id)", 1)}
        |), means$it AS (
        |  SELECT a.c, dm.d, CAST(FLOOR(CAST(SUM(dm.q) AS DOUBLE) / COUNT(*)) AS BIGINT) AS val
        |  FROM assign$it a JOIN dims dm USING (vec_id)
        |  GROUP BY 1, 2
        |), cents$it AS (
        |  SELECT cp.c, cp.d, COALESCE(m.val, cp.val) AS val
        |  FROM cents${it - 1} cp LEFT JOIN means$it m ON m.c = cp.c AND m.d = cp.d
        |)""".stripMargin
    }.mkString(", ")
    (ctes, s"cents$iters")
  }

  /** Integer-exact IVF under random cluster count, Lloyd iteration count
    * and probe depth — the c18_ann_ivf_md5 oracle with its Lloyd steps
    * unrolled programmatically to the drawn depth. */
  private def ivfDraw(r: Random, name: String): FuzzQuery = {
    val c = Seq(4, 8, 16)(r.nextInt(3))
    val iters = 1 + r.nextInt(3) // 1..3
    val probes = 1 + r.nextInt(3) // 1..3
    val (lloyd, last) = lloydCtes(iters)
    val sql =
      s"""WITH dims AS (
        |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS d,
        |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) + 1024 AS q
        |  FROM embeddings
        |), sample AS (
        |  SELECT vec_id FROM embeddings WHERE vec_id % 4 = 0 ORDER BY vec_id LIMIT 4096
        |), init AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS c, vec_id
        |  FROM (SELECT vec_id FROM sample ORDER BY vec_id LIMIT $c)
        |), cents0 AS (
        |  SELECT i.c, dm.d, dm.q AS val FROM init i JOIN dims dm USING (vec_id)
        |), $lloyd, final_assign AS (
        |  ${assignSql(last, "", 1)}
        |), probes AS (
        |  SELECT vec_id AS q_id, c AS c_id FROM (
        |    SELECT dm.vec_id, ct.c, SUM((dm.q - ct.val) * (dm.q - ct.val)) AS dist
        |    FROM dims dm JOIN $last ct USING (d)
        |    WHERE dm.vec_id < 5
        |    GROUP BY 1, 2)
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, c) <= $probes
        |)
        |SELECT p.q_id, f.c AS c_id, f.vec_id AS neighbor_id,
        |  round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) AS score
        |FROM probes p
        |JOIN final_assign f ON f.c = p.c_id AND f.vec_id <> p.q_id
        |JOIN embeddings ea ON ea.vec_id = p.q_id
        |JOIN embeddings eb ON eb.vec_id = f.vec_id
        |ORDER BY q_id, c_id, neighbor_id""".stripMargin
    FuzzQuery(name, sql, (s, d) =>
      graft.similarity.Similarity.ivfMd5Candidates(
        Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
        c = c, iters = iters, sampleMod = 4, nQueries = 5, probes = probes)
        .orderBy("q_id", "c_id", "neighbor_id"))
  }

  /** Integer-exact SemDeDup under random cluster count, Lloyd depth,
    * probe depth and prune threshold — the c17_semantic_dedup_md5 oracle
    * with its Lloyd steps unrolled to the drawn depth. Exact for any
    * parameter value: the prune cut is taken on the 1e-6-rounded cosine
    * in both engines, so the drawn τ cannot sit between two engines'
    * unrounded accumulations. */
  private def semanticDraw(r: Random, name: String): FuzzQuery = {
    val c = Seq(4, 8, 16)(r.nextInt(3))
    val iters = 1 + r.nextInt(3) // 1..3
    val probes = 1 + r.nextInt(2) // 1..2
    val tau = Seq("0.85", "0.9", "0.95")(r.nextInt(3))
    val (lloyd, last) = lloydCtes(iters)
    val sql =
      s"""WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000,
        |    list_append(embedding[1:len(embedding)-1], CAST(0.0 AS FLOAT))
        |  FROM embeddings WHERE vec_id < 3
        |), dims AS (
        |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS d,
        |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) + 1024 AS q
        |  FROM corpus
        |), sample AS (
        |  SELECT vec_id FROM corpus WHERE vec_id % 4 = 0 ORDER BY vec_id LIMIT 4096
        |), init AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS c, vec_id
        |  FROM (SELECT vec_id FROM sample ORDER BY vec_id LIMIT $c)
        |), cents0 AS (
        |  SELECT i.c, dm.d, dm.q AS val FROM init i JOIN dims dm USING (vec_id)
        |), $lloyd, home AS (
        |  ${assignSql(last, "", 1)}
        |), probed AS (
        |  ${assignSql(last, "", probes)}
        |), drops AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM probed a JOIN probed b ON a.c = b.c AND a.vec_id < b.vec_id
        |  JOIN corpus ca ON ca.vec_id = a.vec_id
        |  JOIN corpus cb ON cb.vec_id = b.vec_id
        |  WHERE round(list_cosine_similarity(ca.embedding::DOUBLE[], cb.embedding::DOUBLE[]), 6) >= $tau
        |)
        |SELECT h.vec_id, h.c AS c_id FROM home h
        |WHERE NOT EXISTS (SELECT 1 FROM drops dr WHERE dr.vec_id = h.vec_id)
        |ORDER BY vec_id""".stripMargin
    FuzzQuery(name, sql, (s, d) =>
      graft.similarity.Similarity.semanticMd5Kept(
        graft.similarity.Similarity.injectedCorpus(Tables.embeddings(s, d)),
        c = c, iters = iters, sampleMod = 4, probes = probes,
        tau = tau.toDouble))
  }

  /** Integer-exact IVF-PQ under random coarse cluster count, shared Lloyd
    * depth, subspace split, codebook size, probe depth and shortlist
    * length — the c18_ann_ivfpq_md5 oracle with BOTH Lloyd chains (coarse
    * + per-subspace PQ) unrolled to the drawn depth and the subspace
    * geometry (s = d // dsub) templated from the drawn m. */
  private def pqDraw(r: Random, name: String): FuzzQuery = {
    val c = Seq(8, 16)(r.nextInt(2))
    val iters = 1 + r.nextInt(2) // 1..2, shared by both chains (as registered)
    val m = Seq(4, 8, 16)(r.nextInt(3))
    val dsub = 64 / m
    val k = Seq(4, 8, 16)(r.nextInt(3))
    val probes = 1 + r.nextInt(2) // 1..2
    val shortlist = Seq(5, 10, 20)(r.nextInt(3))
    val (lloyd, last) = lloydCtes(iters)
    def passignSql(books: String, filter: String): String =
      s"""SELECT vec_id, s, j FROM (
        |    SELECT pd.vec_id, pd.s, b.j, SUM((pd.q - b.val) * (pd.q - b.val)) AS dist
        |    FROM pdims pd $filter JOIN $books b ON b.s = pd.s AND b.i = pd.i
        |    GROUP BY 1, 2, 3)
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, j) = 1""".stripMargin
    val plloyd = (1 to iters).map { it =>
      s"""passign$it AS (
        |  ${passignSql(s"books${it - 1}", "JOIN sample USING (vec_id)")}
        |), pmeans$it AS (
        |  SELECT a.j, a.s, pd.i, CAST(FLOOR(CAST(SUM(pd.q) AS DOUBLE) / COUNT(*)) AS BIGINT) AS val
        |  FROM passign$it a JOIN pdims pd ON pd.vec_id = a.vec_id AND pd.s = a.s
        |  GROUP BY 1, 2, 3
        |), books$it AS (
        |  SELECT bp.s, bp.j, bp.i, COALESCE(m.val, bp.val) AS val
        |  FROM books${it - 1} bp LEFT JOIN pmeans$it m ON m.s = bp.s AND m.j = bp.j AND m.i = bp.i
        |)""".stripMargin
    }.mkString(", ")
    val blast = s"books$iters"
    val sql =
      s"""WITH dims AS (
        |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS d,
        |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) + 1024 AS q
        |  FROM embeddings
        |), sample AS (
        |  SELECT vec_id FROM embeddings WHERE vec_id % 4 = 0 ORDER BY vec_id LIMIT 4096
        |), init AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS c, vec_id
        |  FROM (SELECT vec_id FROM sample ORDER BY vec_id LIMIT $c)
        |), cents0 AS (
        |  SELECT i.c, dm.d, dm.q AS val FROM init i JOIN dims dm USING (vec_id)
        |), $lloyd, final_assign AS (
        |  ${assignSql(last, "", 1)}
        |), probes AS (
        |  SELECT vec_id AS q_id, c AS c_id FROM (
        |    SELECT dm.vec_id, ct.c, SUM((dm.q - ct.val) * (dm.q - ct.val)) AS dist
        |    FROM dims dm JOIN $last ct USING (d)
        |    WHERE dm.vec_id < 5
        |    GROUP BY 1, 2)
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, c) <= $probes
        |), pdims AS (
        |  SELECT vec_id, CAST(d // $dsub AS INT) AS s, CAST(d % $dsub AS INT) AS i, q FROM dims
        |), pinit AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS j, vec_id
        |  FROM (SELECT vec_id FROM sample ORDER BY vec_id LIMIT $k)
        |), books0 AS (
        |  SELECT pd.s, pi.j, pd.i, pd.q AS val FROM pinit pi JOIN pdims pd USING (vec_id)
        |), $plloyd, codes AS (
        |  SELECT vec_id, s, j AS code FROM (
        |    SELECT pd.vec_id, pd.s, b.j, SUM((pd.q - b.val) * (pd.q - b.val)) AS dist
        |    FROM pdims pd JOIN $blast b ON b.s = pd.s AND b.i = pd.i
        |    GROUP BY 1, 2, 3)
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, j) = 1
        |), lut AS (
        |  SELECT pd.vec_id AS q_id, pd.s, b.j AS code, SUM((pd.q - b.val) * (pd.q - b.val)) AS dist
        |  FROM pdims pd JOIN $blast b ON b.s = pd.s AND b.i = pd.i
        |  WHERE pd.vec_id < 5
        |  GROUP BY 1, 2, 3
        |), cand AS (
        |  SELECT p.q_id, f.vec_id AS neighbor_id
        |  FROM probes p JOIN final_assign f ON f.c = p.c_id AND f.vec_id <> p.q_id
        |), adc AS (
        |  SELECT ca.q_id, ca.neighbor_id, CAST(SUM(l.dist) AS BIGINT) AS adc
        |  FROM cand ca
        |  JOIN codes cd ON cd.vec_id = ca.neighbor_id
        |  JOIN lut l ON l.q_id = ca.q_id AND l.s = cd.s AND l.code = cd.code
        |  GROUP BY 1, 2
        |), shortlist AS (
        |  SELECT q_id, neighbor_id, adc FROM adc
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc, neighbor_id) <= $shortlist
        |)
        |SELECT sl.q_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY sl.q_id
        |    ORDER BY round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) DESC,
        |      sl.neighbor_id) AS INT) AS rnk,
        |  sl.neighbor_id, sl.adc,
        |  round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) AS score
        |FROM shortlist sl
        |JOIN embeddings ea ON ea.vec_id = sl.q_id
        |JOIN embeddings eb ON eb.vec_id = sl.neighbor_id
        |ORDER BY q_id, rnk""".stripMargin
    FuzzQuery(name, sql, (s, d) =>
      graft.similarity.Similarity.ivfPqMd5Rows(
        Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
        c = c, iters = iters, sampleMod = 4, nQueries = 5, probes = probes,
        m = m, k = k, shortlist = shortlist))
  }
}
