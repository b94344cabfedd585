package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (north-star): image/audio/video payloads ride
  * through the engine as opaque `binary` columns with typed metadata structs;
  * decode / feature-extract run as partition-batched transforms.
  *
  * Image decode is REAL for formats the JDK reads (PNG/JPEG/GIF/BMP via
  * `javax.imageio`, in-memory). Audio/video decode — no codecs ship in this
  * container — is a clearly-marked deterministic STUB; the Spark-side
  * plumbing (schema, partition batching, typed signatures, binary hygiene)
  * is real and tested, and swapping the stub for a JNI/codec call changes
  * nothing structural.
  *
  * Scale posture: decode is a narrow `mapPartitions` (no shuffle); payload
  * bytes never pass through a wide transform; repartitioning for decoder
  * parallelism happens on the small metadata projection, not the blobs.
  */
object Multimodal {

  /** Typed media row: opaque payload + envelope metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      uri: String,
      payload: Array[Byte]
  )

  final case class DecodedMedia(
      media_id: Long,
      kind: String,
      uri: String,
      byte_len: Long,
      sha256: String,
      width: Int,            // STUB-derived for image/video; 0 for audio
      height: Int,
      channels: Int,
      duration_ms: Long      // STUB-derived for audio/video; 0 for image
  )

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("uri", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true)
  ))

  /** Image decode via the JDK's own codecs (`javax.imageio` reads PNG/JPEG/
    * GIF/BMP without extra dependencies): real width/height/channels for
    * payloads ImageIO recognizes, None otherwise.
    */
  // One-time: keep ImageIO fully in memory — with the default disk cache,
  // every read spools the (already in-memory) payload to a tmpdir file.
  private lazy val imageIoInMemory: Unit = javax.imageio.ImageIO.setUseCache(false)

  private[operators] def imageIoDecode(payload: Array[Byte]): Option[(Int, Int, Int)] =
    try {
      imageIoInMemory
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else Some((img.getWidth, img.getHeight,
        math.max(1, img.getColorModel.getNumComponents)))
    } catch { case _: Exception => None }

  /** Audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU):
    * (channels, duration_ms) when the header parses, None otherwise.
    */
  private[operators] def audioDecode(payload: Array[Byte]): Option[(Int, Long)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt    = in.getFormat
        val frames = in.getFrameLength
        // AudioSystem.NOT_SPECIFIED frame length → fall back to the stub so
        // audio rows keep the duration_ms > 0 invariant.
        if (frames <= 0 || fmt.getFrameRate <= 0) None
        else Some((math.max(1, fmt.getChannels),
          math.max(1L, math.round(frames * 1000.0 / fmt.getFrameRate))))
      } finally in.close()
    } catch { case _: Exception => None }

  /** Decode kernel: REAL for images (javax.imageio: PNG/JPEG/GIF/BMP) and
    * audio (javax.sound.sampled: WAV/AIFF/AU) the JDK can read;
    * deterministic STUB for video and unrecognized bytes (no video codecs
    * ship in this container — swapping a real one in changes nothing
    * structural).
    */
  private[operators] def stubDecode(kind: String, payload: Array[Byte]): (Int, Int, Int, Long) = {
    if (payload == null || payload.isEmpty) (0, 0, 0, 0L)
    else {
      lazy val h = payload.foldLeft(17L)((acc, b) => acc * 31L + (b & 0xffL)).abs
      kind match {
        case "image" =>
          imageIoDecode(payload) match {
            case Some((w, ht, c)) => (w, ht, c, 0L)
            case None => (((h % 1920) + 1).toInt, ((h / 7 % 1080) + 1).toInt, 3, 0L)
          }
        case "audio" =>
          audioDecode(payload) match {
            case Some((c, d)) => (0, 0, c, d)
            case None         => (0, 0, (h % 2 + 1).toInt, (h % 600000L) + 1L)
          }
        case "video" => (((h % 1920) + 1).toInt, ((h / 7 % 1080) + 1).toInt, 3, (h % 600000L) + 1L)
        case _       => (0, 0, 0, 0L)
      }
    }
  }

  /** Decode/feature-extract as a typed partition-batched transform: one
    * MessageDigest per partition, rows streamed, no shuffle.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    implicit val enc = Encoders.product[DecodedMedia]
    media.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
        digest.reset()
        val sha = digest.digest(bytes).map("%02x".format(_)).mkString
        val (w, h, c, d) = stubDecode(r.kind, bytes)
        DecodedMedia(r.media_id, r.kind, r.uri, bytes.length.toLong, sha, w, h, c, d)
      }
    }
  }

  /** Resize plumbing (aspect-preserving fit into `maxW`×`maxH`, no upscale):
    * recomputes target dimensions and re-stamps metadata in the same
    * partition-batched shape `decode` uses; the pixel transcode itself is
    * the same STUB boundary (payload passes through untouched here — a real
    * codec swaps bytes inside the same mapPartitions batch).
    */
  def resize(decoded: Dataset[DecodedMedia], maxW: Int, maxH: Int): Dataset[DecodedMedia] = {
    require(maxW > 0 && maxH > 0, "target dims must be positive")
    implicit val enc = Encoders.product[DecodedMedia]
    decoded.mapPartitions { rows =>
      rows.map { r =>
        if (r.width <= 0 || r.height <= 0) r
        else {
          val scale = math.min(1.0,
            math.min(maxW.toDouble / r.width, maxH.toDouble / r.height))
          r.copy(
            width = math.max(1, math.round(r.width * scale).toInt),
            height = math.max(1, math.round(r.height * scale).toInt))
        }
      }
    }
  }

  /** Frame-sampling plumbing for video rows: emits `framesPerItem` sample
    * descriptors per video (frame index + deterministic offset). The frame
    * *decode* is the same STUB boundary; the explode/flatMap shape is what a
    * real sampler uses.
    */
  def sampleFrames(media: DataFrame, framesPerItem: Int): DataFrame = {
    // Guard: sequence(0, framesPerItem-1) with framesPerItem = 0 would step
    // DOWNWARD and emit bogus frames 0 and -1 rather than none.
    require(framesPerItem > 0, s"framesPerItem must be positive, got $framesPerItem")
    media
      .filter(col("kind") === "video")
      .withColumn("frame_idx", explode(sequence(lit(0), lit(framesPerItem - 1))))
      .withColumn("frame_offset_ms", col("frame_idx") * lit(1000L))
      .select(col("media_id"), col("uri"), col("frame_idx"), col("frame_offset_ms"))
  }

  /** Untyped metadata pass usable straight from SQL: byte length + sha2 over
    * the binary column, without deserializing payloads into JVM objects twice.
    */
  def withBinaryMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("byte_len", length(col(payloadCol)).cast("long"))
      .withColumn("sha256", sha2(col(payloadCol), 256))
}
