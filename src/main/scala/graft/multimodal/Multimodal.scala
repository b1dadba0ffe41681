package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder north-star scope; no counterpart in
  * the reference).
  *
  * Media ride as opaque `binary` columns with typed metadata; decode /
  * feature-extract run per-partition in batches (the Scala analog of
  * `mapInPandas`). The decode kernels are STUBS — the real image/audio
  * libraries are not in this container — but the Spark-side contract
  * (schema, batching, partition sizing, deterministic output shape) is
  * real and tested, so swapping a JNI/FFI decoder in changes one function.
  */
object Multimodal {

  /** Canonical media-table schema: content-addressed binary + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("sha256", StringType, nullable = false)
  ))

  /** Derive a media table from any (id, text) source — the test fixture
    * path: bytes are real, only their interpretation is fake.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String,
               mime: String = "application/octet-stream"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mime).as("mime"),
      col(textCol).cast("binary").as("content"))
      .withColumn("n_bytes", octet_length(col("content")).cast("long"))
      .withColumn("sha256", sha2(col("content"), 256))

  final case class MediaFeatures(
      media_id: Long, width: Int, height: Int, n_frames: Int,
      features: Array[Float])

  /** STUB decode kernel — deterministic fake: derives dimensions and a
    * feature vector from the content bytes. Replace with a real decoder
    * (JNI/FFI) without touching the Spark plumbing around it.
    */
  private[multimodal] def decodeStub(id: Long, bytes: Array[Byte], dim: Int): MediaFeatures = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.abs(h % 512)
    val height = 64 + math.abs((h >> 9) % 512)
    val nFrames = 1 + math.abs((h >> 18) % 16)
    val features =
      if (bytes.isEmpty) Array.fill(dim)(0.0f)
      else Array.tabulate(dim) { i =>
        // floorMod, not abs%: abs(Int.MinValue) is negative
        val v = bytes(java.lang.Math.floorMod((h + i * 2654435761L).toInt, bytes.length))
        (v.toInt & 0xFF) / 255.0f
      }
    MediaFeatures(id, width, height, nFrames, features)
  }

  /** Batched per-partition decode + feature extraction — the `mapInPandas`
    * shape: one pass per partition, batch-local buffers, fixed-size output
    * vectors. Partition count (not row count) bounds peak memory, so
    * repartition by `n_bytes` budget upstream for huge blobs.
    */
  def extractFeatures(df: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch => // batch shape ≅ pandas record batches
          batch.iterator.map { case (id, bytes) =>
            decodeStub(id, Option(bytes).getOrElse(Array.emptyByteArray), dim)
          }
        }
      }
  }

  /** Frame sampling stub for video-like media: every k-th fake frame index,
    * capped — the plumbing for a real frame extractor.
    */
  def sampleFrameIndexes(nFrames: Int, stride: Int, maxFrames: Int): Seq[Int] =
    (0 until nFrames by math.max(stride, 1)).take(maxFrames)
}
