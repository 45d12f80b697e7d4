package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns plus a typed metadata struct, with decode /
  * feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing (schemas, batching, partition sizing) is real;
  * the actual media DECODE IS A STUB — this container has no image/audio
  * codecs, so [[stubDecodeImage]] derives deterministic fake
  * width/height/channels from a hash of the payload. Swap the stub for a
  * real codec behind the same schema in production (e.g. a
  * `mapPartitions` over batches with a JNI decoder, or `mapInArrow` from
  * PySpark). Everything downstream of the decode schema is codec-agnostic.
  */
object Multimodal {

  /** Media metadata schema attached next to every binary payload. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", LongType)))

  /** Wrap a binary payload column with its typed metadata struct. */
  def withMediaMeta(payload: Column, mime: Column): Column =
    struct(mime.as("mime"),
           length(payload).cast(LongType).as("n_bytes"),
           xxhash64(payload).as("checksum"))

  /** STUB decode: deterministic fake image properties from the payload
    * hash (stands in for a real codec; see object doc). Output schema is
    * the real contract: struct(width, height, channels, ok). */
  def stubDecodeImage(payload: Column): Column = {
    val h = xxhash64(payload)
    struct(
      (pmod(h, lit(1920L)) + 1L).cast(IntegerType).as("width"),
      (pmod(h / 7L, lit(1080L)) + 1L).cast(IntegerType).as("height"),
      (pmod(h / 31L, lit(3L)) + 1L).cast(IntegerType).as("channels"),
      (length(payload) > 0).as("ok"))
  }

  /** STUB feature extraction: a fixed-length deterministic pseudo-feature
    * vector (real contract: Array[Float] of `dim`). */
  def stubImageFeatures(payload: Column, dim: Int = 8): Column =
    array((0 until dim).map { i =>
      (pmod(xxhash64(payload, lit(i)), lit(1000L)).cast(DoubleType) /
        lit(1000.0)).cast(FloatType)
    }: _*)

  /** STUB frame sampling for video-like payloads: split the payload into
    * `frames` byte-range "frames" (real contract: array of binary). */
  def stubSampleFrames(payload: Column, frames: Int = 4): Column = {
    val n = length(payload)
    val step = greatest((n / frames).cast(IntegerType), lit(1))
    filter(
      array((0 until frames).map { i =>
        substring(payload, lit(i) * step + 1, step)
      }: _*),
      f => length(f) > 0)
  }

  /** Build a media table from any binary source column: payload + typed
    * meta + decoded properties + features. Partition advice: payloads are
    * large — repartition so partitions stay ~128MB
    * (`df.repartition(ceil(totalBytes / 128MB))`) before wide decode
    * stages; this helper keeps the narrow no-shuffle shape. */
  def mediaPipeline(df: DataFrame, payload: Column, mime: Column): DataFrame =
    df.withColumn("media_meta", withMediaMeta(payload, mime))
      .withColumn("decoded", stubDecodeImage(payload))
      .withColumn("features", stubImageFeatures(payload))
}
