package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.8): media as opaque binary
  * columns with typed metadata, mirroring the reference's per-node attribute
  * bag (reference: dwio/nimble/velox/Schema.fbs:60-69).
  *
  * The actual media decode (image/audio codecs) is STUBBED — this container
  * ships no codec libraries — with a deterministic fake that reads "header"
  * bytes; everything Spark-side (schema, binary storage in the nimble format,
  * batched frame extraction, partitioning) is real and tested.
  */
object Multimodal {

  /** Wrap a payload column into the multimodal layout:
    * (id, media: binary, meta: struct<mime, size, sha>). */
  def binarize(df: DataFrame, idCol: String, payload: Column, mime: String): DataFrame =
    df.select(
      col(idCol),
      payload.cast("binary").as("media"),
      struct(
        lit(mime).as("mime"),
        octet_length(payload.cast("binary")).as("size"),
        sha2(payload.cast("binary"), 256).as("sha")).as("meta"))

  /** STUB decode: a real implementation would hand `media` to an image/audio
    * codec; the deterministic fake derives "width"/"height" from the first
    * header bytes so downstream plumbing (schema, joins, aggregation) is
    * exercised end-to-end. */
  def decodeStub(df: DataFrame): DataFrame =
    df.withColumn("decoded", struct(
      (conv(substr(hex(col("media")), lit(1), lit(4)), 16, 10).cast("long") % 1920).as("width"),
      (conv(substr(hex(col("media")), lit(5), lit(4)), 16, 10).cast("long") % 1080).as("height")))

  /** Frame sampling: split the payload into fixed-size frames; one output row
    * per frame with its index — the shape a video/audio pipeline needs.
    * Pure column ops: substring on binary via substr(media, pos, len). */
  def sampleFrames(df: DataFrame, idCol: String, frameBytes: Int, everyNth: Int = 1): DataFrame = {
    val nFrames = ceil(octet_length(col("media")).cast("double") / frameBytes).cast("int")
    df.withColumn("frame_idx",
        explode(filter(sequence(lit(0), nFrames - 1), i => i % everyNth === 0)))
      .select(
        col(idCol),
        col("frame_idx"),
        substr(col("media"), (col("frame_idx") * frameBytes + 1).cast("int"), lit(frameBytes)).as("frame"))
      .withColumn("frame_size", octet_length(col("frame")))
  }
}
