package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata; decode/feature-extract run per partition so
  * one decoder instance amortizes over a batch of rows (the Scala analog of
  * a Pandas-UDF batch).
  *
  * The decode step itself is STUBBED — media codecs are not available in
  * this environment — behind [[Multimodal.Decoder]]; [[Multimodal.FakeDecoder]]
  * is a deterministic stand-in so the Spark-side plumbing (schema, batching,
  * partitioning, frame explode) is real and tested. A production decoder
  * implements the same trait over the actual codec library.
  */
object Multimodal {

  /** Typed metadata extracted from one media blob. */
  final case class MediaMeta(
      media_id: Long,
      n_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      checksum: String)

  /** One sampled frame (video path): frame index + a feature stub. */
  final case class FrameSample(media_id: Long, frame_idx: Int, feature: Array[Float])

  trait Decoder extends Serializable {
    def decode(bytes: Array[Byte]): (String, Int, Int) // (format, width, height)
    def frameFeature(bytes: Array[Byte], frameIdx: Int): Array[Float]
  }

  /** Deterministic fake: derives dimensions from the first bytes and a
    * feature vector from a rolling byte hash — stable across runs/engines. */
  object FakeDecoder extends Decoder {
    def decode(bytes: Array[Byte]): (String, Int, Int) = {
      val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
      val fmt = if (b0 % 2 == 0) "img/fake-rgb" else "img/fake-gray"
      (fmt, 16 + b0 % 64, 16 + b1 % 64)
    }
    def frameFeature(bytes: Array[Byte], frameIdx: Int): Array[Float] = {
      var h = 1125899906842597L + frameIdx
      bytes.foreach(b => h = 31 * h + (b & 0xff))
      Array.tabulate(4)(i => ((h >>> (i * 8)) & 0xff).toFloat / 255f)
    }
  }

  /** (media_id: Long, media: binary) → typed metadata; one decoder per
    * partition. */
  def extractMeta(media: DataFrame, decoder: Decoder = FakeDecoder): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (fmt, w, h) = decoder.decode(bytes)
          md.reset()
          val sum = md.digest(bytes).map("%02x".format(_)).mkString
          MediaMeta(id, bytes.length.toLong, fmt, w, h, sum)
        }
      }
  }

  /** Codegen-native frame slicing: one row per fixed-size byte window of
    * the blob — the decode-free path for frame features expressible in
    * Spark SQL itself (checksums, sizes, byte stats). Unlike the
    * decoder-based ops below this never leaves whole-stage codegen: the
    * explode and the byte slice are built-in expressions, so it is the
    * preferred shape whenever the per-frame computation doesn't need a
    * codec. Output: (media_id, frame_idx: Long, frame: binary). */
  def sliceFrames(media: DataFrame, frameBytes: Int): DataFrame = {
    require(frameBytes > 0)
    media.select(col("media_id"), col("media"))
      .withColumn("n_frames", floor(length(col("media")) / frameBytes).cast("long"))
      .filter(col("n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"),
        col("media"))
      .select(col("media_id"), col("frame_idx"),
        expr(s"substring(media, CAST(frame_idx * $frameBytes + 1 AS INT), $frameBytes)").as("frame"))
  }

  /** Sample every `stride`-th frame (stub: one frame per `frameBytes` bytes),
    * emitting a feature vector per frame — the explode-shaped path a video
    * pipeline needs. */
  def sampleFrames(
      media: DataFrame,
      stride: Int,
      frameBytes: Int = 100,
      decoder: Decoder = FakeDecoder): Dataset[FrameSample] = {
    implicit val enc = Encoders.product[FrameSample]
    media.select(col("media_id").cast("long"), col("media"))
      .flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val nFrames = bytes.length / frameBytes
        (0 until nFrames by stride).map(i => FrameSample(id, i, decoder.frameFeature(bytes, i)))
      }
  }
}
