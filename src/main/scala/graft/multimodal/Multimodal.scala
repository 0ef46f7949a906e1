package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}

/** Multimodal-column plumbing (LLM-pipeline pillar): treat image/audio/video
  * payloads as opaque `binary` columns plus typed metadata, with
  * decode/feature-extract expressed as ordinary distributed transforms.
  *
  * The container has no image/audio codecs, so the decode/feature steps use
  * the simplest REAL formats and statistics that exercise the same plumbing:
  * [[decodeBatch]] parses an actual binary PGM container byte-by-byte inside
  * `mapPartitions`, and [[sliceBrightness]] extracts per-region mean byte
  * value through a fused codegen expression. Both are exactly reproducible
  * by the DuckDB oracle, so every registered query here is full-oracle. A
  * heavier deployment swaps the parser/statistic body for its codec call
  * inside the same `transform(...)`/`mapPartitions` shape — schema,
  * partitioning, batch shape, and shuffle profile (none) stay as tested.
  */
object Multimodal {

  /** Canonical asset schema: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("payload", BinaryType),
    StructField("media_type", StringType),
    StructField("n_bytes", IntegerType)))

  /** Build an asset table from documents: the text bytes stand in for an
    * opaque media payload (same plumbing, container-available data). */
  def assets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("asset_id"),
      col("text").cast(BinaryType).as("payload"),
      lit("application/octet-stream").as("media_type"),
      length(col("text").cast(BinaryType)).as("n_bytes"))

  /** Binary metadata extraction — byte length, chunk count for a 256-byte
    * chunking, payload checksum, first-8-byte header. All computable by
    * DuckDB over the raw text → full oracle. */
  val binaryMeta: QueryDef = QueryDef(
    "mm_binary_meta", "C15 north_star-multimodal",
    """SELECT doc_id AS asset_id,
      |  CAST(strlen(text) AS INT) AS n_bytes,
      |  CAST(FLOOR((strlen(text) + 255) / 256) AS INT) AS n_chunks,
      |  md5(text) AS checksum,
      |  upper(hex(substr(text, 1, 8))) AS header_hex
      |FROM documents ORDER BY asset_id""".stripMargin) { (s, d) =>
    assets(s, d).select(
      col("asset_id"),
      col("n_bytes"),
      floor((col("n_bytes") + lit(255)) / lit(256)).cast(IntegerType).as("n_chunks"),
      md5(col("payload")).as("checksum"),
      upper(hex(substring(col("payload"), 1, 8))).as("header_hex"))
      .orderBy("asset_id")
  }

  /** Per-slice brightness feature — the payload is cut into `dims`
    * contiguous byte slices (boundaries floor(len·i/dims)) and dim i is the
    * slice's mean unsigned byte value normalized to [0, 1): the trivial
    * image feature (mean brightness per region) computed for real, in one
    * fused [[graft.functions.ByteSliceSums]] codegen pass over the bytes.
    * A heavier deployment replaces the slice statistic with a codec+encoder
    * call in the same per-row projection shape (no shuffle, embarrassingly
    * parallel). Empty slices map to 0. */
  def sliceBrightness(payload: Column, nBytes: Column, dims: Int): Column = {
    // Boundary math in LONG: ByteSliceSums computes floor(n.toLong·i/dims)
    // internally, and an Int-typed nBytes·(i+1) would overflow past
    // ~256 MB payloads — the column-side geometry must match the
    // expression's Long arithmetic at every payload size.
    val nb = nBytes.cast(LongType)
    transform(
      graft.functions.VectorExprs.byteSliceSums(payload, dims),
      (s, i) => s.cast(DoubleType) / (lit(255.0) * greatest(
        floor(nb * (i + 1) / lit(dims)) - floor(nb * i / lit(dims)),
        lit(1))))
  }

  /** Byte offsets of an `n`-frame even sampling of a payload —
    * floor(len·i/n) for i in [0, n). Shared by the library frame and the
    * registered oracle query so the sampling geometry cannot drift. */
  def frameOffsets(nBytes: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)), // Long multiply: no Int overflow
      i => floor(nBytes.cast(LongType) * i / lit(n)).cast(IntegerType))

  /** Feature extraction over the asset table: per-slice brightness vector +
    * frame-sample offsets for a 4-frame sampling of the payload. Library
    * surface (array-typed); the registered query below renders the exact
    * integer slice sums instead so the driver's sorted-column hash compare
    * applies and no float formatting can diverge between engines. */
  def featureFrame(s: SparkSession, d: String): DataFrame =
    assets(s, d).select(
      col("asset_id"),
      col("media_type"),
      sliceBrightness(col("payload"), col("n_bytes"), 8).as("feature"),
      frameOffsets(col("n_bytes"), 4).as("frame_offsets"))

  /** FULL-ORACLE feature extraction: the 8 per-slice byte sums (exact
    * integers — the un-normalized numerators of [[sliceBrightness]]) and
    * the 4 frame offsets, comma-joined. DuckDB recomputes every slice sum
    * from the same document text via substr + per-char ascii (text is pure
    * ASCII in this corpus, so char functions equal byte functions); any
    * slice-boundary or summing bug in the codegen expression breaks the
    * hash compare. */
  val featureVec: QueryDef = QueryDef(
    "mm_feature_vec", "C15 north_star-multimodal",
    """SELECT doc_id AS asset_id,
      |  'application/octet-stream' AS media_type,
      |  array_to_string(list_transform(range(0, 8), i ->
      |    coalesce(list_sum(list_transform(
      |      string_split(substr(text, CAST((strlen(text)*i)//8 AS INT)+1,
      |        CAST((strlen(text)*(i+1))//8 - (strlen(text)*i)//8 AS INT)), ''),
      |      c -> ascii(c))), 0)), ',') AS feature_str,
      |  array_to_string(list_transform(range(0, 4), i ->
      |    CAST((strlen(text)*i)//4 AS INT)), ',') AS frame_offsets_str
      |FROM documents ORDER BY asset_id""".stripMargin) { (s, d) =>
    assets(s, d).select(
      col("asset_id"),
      col("media_type"),
      concat_ws(",", transform(
        graft.functions.VectorExprs.byteSliceSums(col("payload"), 8),
        v => v.cast(StringType))).as("feature_str"),
      concat_ws(",", frameOffsets(col("n_bytes"), 4)).as("frame_offsets_str"))
      .orderBy("asset_id")
  }

  /** PGM-planted asset table: each payload is a REAL (if minimal) binary
    * media file — netpbm binary-PGM, `P5\n<w> <h>\n<maxval>\n<pixels>`
    * (public format; the simplest raster container in production use) —
    * built deterministically from the documents table: width from the doc
    * id (1..16), height from the text length (≤ 8 rows), the text's first
    * w·h bytes as the pixel raster. The decode path below parses these
    * BYTES with a strict header parser, and because the planting is
    * closed-form, DuckDB can recompute every decoded field from the same
    * source rows — a full oracle over an actual binary decode. */
  def pgmAssets(spark: SparkSession, dir: String): DataFrame = {
    val w = (lit(1) + pmod(col("doc_id"), lit(16))).cast(IntegerType)
    val h = least(floor(length(col("text")) / w).cast(IntegerType), lit(8))
    Tables.documents(spark, dir).select(
      col("doc_id").as("asset_id"),
      concat(
        format_string("P5\n%d %d\n255\n", w, h).cast(BinaryType),
        col("text").substr(lit(1), w * h).cast(BinaryType)).as("payload"))
  }

  /** Decoded-PGM record produced by the batch decode path. */
  final case class DecodedPgm(
      asset_id: Long, width: Int, height: Int, maxval: Int,
      n_pix: Int, pix_sum: Long, pix_md5: String)

  /** The mapPartitions batch-decode shape — the Scala analogue of a pandas
    * mapInPandas decode: the partition iterator is consumed in order, the
    * codec (here a REAL byte-level P5 parser, [[decodeOne]]) is invoked
    * once per payload inside the executor, and the output is a typed
    * Dataset. A heavier deployment replaces ONLY the body of `decodeOne`
    * with its codec call; partitioning, batch shape and schema stay exactly
    * as tested. No shuffle: decode is embarrassingly parallel. */
  def decodeBatch(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[DecodedPgm] = {
    import spark.implicits._
    pgmAssets(spark, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) => decodeOne(id, payload) }
      }
  }

  /** Strict binary-P5 parser: magic `P5\n`, three decimal header fields
    * (`w<space>h\n<maxval>\n`), then the raw pixel raster to end-of-buffer.
    * Malformed headers throw (fail-fast like FAILFAST CSV mode) — decode
    * errors must surface, not silently zero. */
  private def decodeOne(id: Long, b: Array[Byte]): DecodedPgm = {
    var p = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"asset $id: $msg at byte $p")
    if (b.length < 3 || b(0) != 'P' || b(1) != '5' || b(2) != '\n') fail("bad magic")
    p = 3
    def int(delim: Char): Int = {
      var v = 0
      var any = false
      while (p < b.length && b(p) >= '0' && b(p) <= '9') {
        v = v * 10 + (b(p) - '0'); any = true; p += 1
      }
      if (!any || p >= b.length || b(p) != delim) fail("bad header int")
      p += 1
      v
    }
    val w = int(' ')
    val h = int('\n')
    val mv = int('\n')
    var sum = 0L
    var i = p
    while (i < b.length) { sum += (b(i) & 0xff); i += 1 }
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(java.util.Arrays.copyOfRange(b, p, b.length))
      .map("%02x".format(_)).mkString
    DecodedPgm(id, w, h, mv, b.length - p, sum, md5)
  }

  /** Registered FULL-ORACLE view of [[decodeBatch]]: the mapPartitions
    * parser must recover exactly the width/height the planting chose, a
    * pixel count of w·h, and the byte-sum/md5 of the planted raster —
    * DuckDB recomputes all of them from the documents rows (text is pure
    * ASCII in this corpus, so char functions equal byte functions). A
    * parser bug of any kind (offset, digit handling, raster slicing)
    * breaks the hash compare. */
  val decodeBatchQuery: QueryDef = QueryDef(
    "mm_decode_batch", "C15 north_star-multimodal",
    """WITH pgm AS (
      |  SELECT doc_id AS asset_id,
      |    CAST(1 + (doc_id % 16) AS INT) AS w,
      |    least(CAST(floor(strlen(text) / (1 + (doc_id % 16))) AS INT), 8) AS h,
      |    text
      |  FROM documents)
      |SELECT asset_id, w AS width, CAST(h AS INT) AS height, 255 AS maxval,
      |  CAST(w * h AS INT) AS n_pix,
      |  CAST(coalesce(list_sum(list_transform(
      |    string_split(substr(text, 1, w*h), ''), c -> ascii(c))), 0) AS BIGINT) AS pix_sum,
      |  md5(substr(text, 1, w*h)) AS pix_md5
      |FROM pgm ORDER BY asset_id""".stripMargin) { (s, d) =>
    decodeBatch(s, d).toDF().orderBy("asset_id")
  }

  /** Chunk-row emission — the asset is split into fixed-size chunks, ONE
    * ROW PER CHUNK with its index and checksum: the layout an object-store
    * uploader, a dedup-by-chunk pass (CDC-style), or a frame-level feature
    * pipeline consumes. Generate (explode of a closed-form index range) +
    * project — no shuffle, chunk count derived arithmetically, so a 100 TB
    * asset table chunks in one embarrassingly parallel pass. Chunking is
    * character-based here so DuckDB's `substr` is an exact oracle (the
    * byte-based binary variant is the same plan with `substring` on the
    * payload column). */
  val chunkRows: QueryDef = QueryDef(
    "mm_chunk_rows", "C15 north_star-multimodal",
    """SELECT doc_id AS asset_id, i AS chunk_idx,
      |  md5(substr(text, (i*64)+1, 64)) AS chunk_md5,
      |  CAST(length(substr(text, (i*64)+1, 64)) AS INT) AS chunk_len
      |FROM documents, unnest(range(0, CAST(ceil(length(text)/64.0) AS INT))) t(i)
      |ORDER BY asset_id, chunk_idx""".stripMargin) { (s, d) =>
    val nChunks = ceil(length(col("text")) / 64.0).cast(IntegerType)
    // Guard nChunks=0 (empty text): sequence(0, -1) would default to step -1
    // and emit two bogus rows, while the oracle's range(0, 0) emits none.
    // explode of NULL emits no rows, matching range() on both empty and null.
    val idx = when(nChunks > 0, sequence(lit(0L), nChunks.cast(LongType) - 1L))
    Tables.documents(s, d)
      .select(col("doc_id").as("asset_id"), col("text"),
        explode(idx).as("chunk_idx"))
      .select(
        col("asset_id"), col("chunk_idx"),
        md5(expr("substring(text, CAST(chunk_idx*64 + 1 AS INT), 64)")).as("chunk_md5"),
        length(expr("substring(text, CAST(chunk_idx*64 + 1 AS INT), 64)")).as("chunk_len"))
      .orderBy("asset_id", "chunk_idx")
  }

  /** Frame sampling — the video-ingest primitive: treat the payload as a
    * frame sequence (fixed 64-byte frames here; a real container swaps in
    * the demuxer's frame index), emit every `stride`-th frame up to a
    * per-asset cap, ONE ROW PER SAMPLED FRAME with its index, byte offset,
    * and content checksum. This is the "sample 8 frames per video for the
    * vision encoder" step of a multimodal training pipeline, done as a
    * closed-form index explode + project: no shuffle, no decode, the frame
    * count is arithmetic on metadata — embarrassingly parallel at any
    * scale, and the sampled-frame table is ~cap/stride of the raw frame
    * count before any heavy decode runs (sample-then-decode, never
    * decode-then-sample). Character-addressed like [[chunkRows]] so
    * DuckDB's `substr` is an exact oracle. */
  val frameSample: QueryDef = QueryDef(
    "mm_frame_sample", "C15 north_star-multimodal",
    """SELECT doc_id AS asset_id, i AS frame_idx,
      |  CAST(i * 16 AS INT) AS byte_off,
      |  md5(substr(text, (i*16)+1, 16)) AS frame_md5
      |FROM documents,
      |  unnest(range(0, least(CAST(floor(length(text)/16.0) AS INT), 36), 5)) t(i)
      |ORDER BY asset_id, frame_idx""".stripMargin) { (s, d) =>
    // full frames only (floor), stride 5, cap 8 samples/asset: indices
    // {0,5,...,35} ∩ [0, n_frames). Same nFrames=0 guard as chunkRows:
    // explode(NULL) emits no rows, matching the oracle's empty range().
    val nFrames = floor(length(col("text")) / 16.0).cast(LongType)
    val hi = least(nFrames, lit(36L)) - 1L
    val idx = when(nFrames > 0, sequence(lit(0L), hi, lit(5L)))
    Tables.documents(s, d)
      .select(col("doc_id").as("asset_id"), col("text"),
        explode(idx).as("frame_idx"))
      .select(
        col("asset_id"), col("frame_idx"),
        (col("frame_idx") * 16L).cast(IntegerType).as("byte_off"),
        md5(expr("substring(text, CAST(frame_idx*16 + 1 AS INT), 16)")).as("frame_md5"))
      .orderBy("asset_id", "frame_idx")
  }

  /** Perceptual-hash-style brightness signature + signature-bucket dedup —
    * the asset analogue of text near-dup bucketing: each payload reduces
    * to an 8-bit signature (bit i set iff slice i's mean byte value
    * exceeds the payload's global mean — the average-hash recipe over the
    * [[sliceBrightness]] slice geometry), then assets group by signature,
    * which is exactly how a media pipeline buckets candidates before an
    * expensive pixel-level verify. One fused `ByteSliceSums` pass per
    * payload, one hash aggregate on the 8-bit key — no shuffle wider than
    * 256 groups.
    *
    * Parity: the mean compare is cross-multiplied (s_i·n vs total·len_i)
    * and evaluated in DOUBLE on both engines — every operand is an exact
    * double (< 2^53) for any payload below ~4 GB, and IEEE multiplication
    * rounds identically, so the bit can never flip between engines; the
    * signature itself is pure integer arithmetic. The oracle recomputes
    * every slice sum from the document text by substr+ascii (ASCII corpus:
    * char functions ≡ byte functions — the [[featureVec]] contract). */
  val brightnessSig: QueryDef = QueryDef(
    "mm_brightness_sig", "C15 C17 north_star-multimodal",
    """WITH s AS (
      |  SELECT doc_id,
      |    CAST(strlen(text) AS BIGINT) AS n,
      |    coalesce(list_sum(list_transform(string_split(text, ''), c -> ascii(c))), 0) AS total,
      |    list_transform(range(0, 8), i ->
      |      coalesce(list_sum(list_transform(
      |        string_split(substr(text, CAST((strlen(text)*i)//8 AS INT)+1,
      |          CAST((strlen(text)*(i+1))//8 - (strlen(text)*i)//8 AS INT)), ''),
      |        c -> ascii(c))), 0)) AS sums
      |  FROM documents),
      |sig AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(range(0, 8), i ->
      |      CASE WHEN CAST(sums[i+1] AS DOUBLE) * CAST(n AS DOUBLE) >
      |                CAST(total AS DOUBLE) *
      |                CAST((n*(i+1))//8 - (n*i)//8 AS DOUBLE)
      |           THEN ([1,2,4,8,16,32,64,128])[i+1] ELSE 0 END)) AS INT) AS sig
      |  FROM s)
      |SELECT sig, count(*) AS n_assets, min(doc_id) AS first_asset
      |FROM sig GROUP BY sig ORDER BY sig""".stripMargin) { (s, d) =>
    val sums = graft.functions.VectorExprs.byteSliceSums(col("payload"), 8)
    val n = col("n_bytes").cast(LongType)
    val withSums = assets(s, d).select(
      col("asset_id"), n.as("n"), sums.as("sums"),
      aggregate(sums, lit(0L), (acc, x) => acc + x).as("total"))
    val sig = (0 until 8).map { i =>
      val si = element_at(col("sums"), i + 1)
      val lenI = (col("n") * (i + 1) / lit(8)).cast(LongType) -
        (col("n") * i / lit(8)).cast(LongType)
      when(si.cast(DoubleType) * col("n").cast(DoubleType) >
        col("total").cast(DoubleType) * lenI.cast(DoubleType),
        lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
    withSums.select(col("asset_id"), sig.as("sig"))
      .groupBy("sig")
      .agg(count(lit(1)).as("n_assets"), min(col("asset_id")).as("first_asset"))
      .orderBy("sig")
  }

  val all: Seq[QueryDef] =
    Seq(binaryMeta, featureVec, decodeBatchQuery, chunkRows, frameSample,
      brightnessSig)
}
