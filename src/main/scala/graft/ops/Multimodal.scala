package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Tables

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns plus typed metadata, processed per-partition in fixed-size
  * batches. The decode itself is STUBBED (no media libraries in this
  * container — see `FakeCodec`, a deterministic fake clearly marked as
  * such); everything Spark-side is real: schema, batching, partition-level
  * processing, and the frame-sampling/feature-extraction operator shapes.
  *
  * At 100 TB the binary payloads dominate I/O, so operators:
  *  - never shuffle the binary column (features/frames are derived in-place
  *    per partition; only the small derived columns flow downstream),
  *  - carry `media_size` so AQE/file splitting can balance partitions,
  *  - run the "codec" once per row inside mapPartitions (the Scala analog
  *    of `mapInPandas` batch processing — amortized per-batch setup).
  */
object Multimodal {

  /** STUB CODEC — deterministic fake standing in for a real image/audio
    * decoder (the real thing would wrap e.g. javax.imageio / ffmpeg and is
    * NOT available offline). Derives stable pseudo-features from bytes so
    * tests are reproducible. */
  object FakeCodec {
    val featureDim = 8

    /** "Decode" → (width, height, nFrames) from the byte stream. */
    def probe(bytes: Array[Byte]): (Int, Int, Int) = {
      val n = bytes.length
      (64 + n % 64, 64 + n % 48, 1 + n % 10)
    }

    /** "Feature-extract" → fixed-size float vector (mean/spread of byte
      * windows — deterministic, shape-compatible with a real embedding). */
    def features(bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](featureDim)
      if (bytes.isEmpty) return out
      val win = math.max(1, bytes.length / featureDim)
      var i = 0
      while (i < featureDim) {
        var s = 0L; var j = i * win
        val end = math.min(bytes.length, j + win)
        while (j < end) { s += (bytes(j) & 0xff); j += 1 }
        out(i) = s.toFloat / math.max(1, end - i * win)
        i += 1
      }
      out
    }

    /** "Frame-sample" → byte offsets of `k` evenly spaced frames. */
    def frameOffsets(nFrames: Int, k: Int): Seq[Int] =
      if (nFrames <= k) 0 until nFrames
      else (0 until k).map(i => i * nFrames / k)

    /** "Perceptual hash" → a 32-bit average-hash over the decoded
      * payload: 32 byte windows (the stand-in for an 8×4 downscaled
      * luminance grid), bit w set iff window w's mean exceeds the whole
      * payload's mean. The compare is the INTEGER cross-multiply
      * `s_w · n > total · c_w` — no division anywhere, so the oracle SQL
      * reproduces every bit exactly. Real deployments swap this for a
      * DCT pHash over decoded pixels; the fingerprint SHAPE, the banding
      * and the hamming verify are the operator. */
    def ahash32(bytes: Array[Byte]): Long = {
      val n = bytes.length
      if (n == 0) return 0L
      var total = 0L
      var i = 0
      while (i < n) { total += bytes(i) & 0xff; i += 1 }
      val win = math.max(1, n / 32)
      var fp = 0L
      var w = 0
      while (w < 32) {
        var s = 0L
        var j = w * win
        val end = math.min(n, j + win)
        val c = end - j
        while (j < end) { s += (bytes(j) & 0xff); j += 1 }
        if (c > 0 && s * n > total * c) fp |= (1L << w)
        w += 1
      }
      fp
    }
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_size", LongType, nullable = false),
    StructField("meta_lang", StringType, nullable = true)))

  /** Fixture adapter: derive a media table from `documents` (text bytes as
    * the opaque payload — the fixtures carry no real media, TESTDATA.md). */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      concat(lit("media/type"), (col("doc_id") % 3).cast("string")).as("media_type"),
      col("text").cast("binary").as("payload"),
      length(col("text")).cast("long").as("media_size"),
      col("lang").as("meta_lang"))

  private val featuresSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Decode + feature-extract per partition. Binary stays partition-local;
    * output carries only small derived columns. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featuresSchema)
    media.select("media_id", "media_type", "payload").mapPartitions { it =>
      it.map { r =>
        val bytes = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
        val (w, h, f) = FakeCodec.probe(bytes)
        // name-based access: robust to select-list reordering upstream
        Row(r.getAs[Long]("media_id"), r.getAs[String]("media_type"),
          w, h, f, FakeCodec.features(bytes))
      }
    }(enc)
  }

  private val framesSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_offset", IntegerType, nullable = false)))

  /** Frame sampling: up to k frames per media row (flatMap — one-to-many,
    * still partition-local, no shuffle). */
  def sampleFrames(media: DataFrame, k: Int = 4): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(framesSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.flatMap { r =>
        val bytes = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
        val (_, _, nFrames) = FakeCodec.probe(bytes)
        FakeCodec.frameOffsets(nFrames, k).zipWithIndex.map { case (off, i) =>
          Row(r.getAs[Long]("media_id"), i, off)
        }
      }
    }(enc)
  }

  private val resizeSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("new_width", IntegerType, nullable = false),
    StructField("new_height", IntegerType, nullable = false)))

  /** "Resize" to fit a bounding box, preserving aspect ratio — the codec
    * call is stubbed (dims come from FakeCodec.probe) but the scaling math
    * and partition-local batch shape are the real operator. */
  def resize(media: DataFrame, maxDim: Int = 32): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(resizeSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val bytes = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
        val (w, h, _) = FakeCodec.probe(bytes)
        val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
        Row(r.getAs[Long]("media_id"), w, h,
          math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
      }
    }(enc)
  }

  /** The shipped query: feature-extract + per-type aggregate of the derived
    * columns. The codec is the deterministic stub, so its probe arithmetic
    * (pure functions of the payload BYTE length) can be mirrored in SQL —
    * the mapPartitions plumbing is therefore oracle-checked end to end,
    * not just rows-counted. */
  def qMediaFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaFromDocuments(spark, dir))
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n"),
        (round(avg(col("width")) * 1e6) / 1e6).as("avg_w"),
        (round(avg(col("height")) * 1e6) / 1e6).as("avg_h"),
        sum(col("n_frames")).as("total_frames"))
      .orderBy(col("media_type"))

  private val phashSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("fp", LongType, nullable = false)))

  /** Per-media perceptual fingerprints — partition-local like every codec
    * call; only (id, 32-bit fp) flows downstream. */
  private[graft] def phashes(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(phashSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val bytes = Option(r.getAs[Array[Byte]]("payload"))
          .getOrElse(Array.emptyByteArray)
        Row(r.getAs[Long]("media_id"), FakeCodec.ahash32(bytes))
      }
    }(enc)
  }

  /** Oracle-checked query: PERCEPTUAL-HASH near-duplicate detection over
    * the media column (r19) — the image-dedup rung of a multimodal
    * training pipeline (datasets dedup images by pHash before training;
    * text dedup never sees them). Fingerprints are the stub codec's
    * 32-bit average-hash ([[FakeCodec.ahash32]] — deterministic, so the
    * whole pipeline is oracle-checked, not rows-counted; on this
    * text-bytes fixture near-misses beyond exact-duplicate payloads are
    * limited, disclosed). The pair search is EXACT LSH BANDING, never
    * media×media: 4 bands of 8 bits — any pair within hamming ≤ 3
    * differs in at most 3 bands, so at least one band matches
    * (pigeonhole: banding is exact for d < bands) — candidates join on
    * (band index, band value), then one bit_count verify. At 100 TB the
    * band join touches only colliding fingerprints, the minhash-LSH
    * scale shape. */
  def qPhashNearDup(spark: SparkSession, dir: String,
                    maxDist: Int = 3): DataFrame = {
    require(maxDist < 4, "4 bands are exact only for hamming < 4")
    val fp = phashes(mediaFromDocuments(spark, dir))
    val bands = fp.select(col("media_id"), col("fp"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("fp"), b * 8).bitwiseAND(lit(255L)).as("bv"))): _*))
        .as("bb"))
      .select(col("media_id"), col("fp"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .distinct()
    cand
      .withColumn("dist",
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
      .orderBy(col("id_a"), col("id_b"))
  }

  def qFrameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaFromDocuments(spark, dir))
      .select(col("media_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        col("frame_offset").cast("long").as("frame_offset"))
      .orderBy(col("media_id"), col("frame_idx"))
}
