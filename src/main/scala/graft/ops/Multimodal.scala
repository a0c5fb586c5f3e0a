package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The decode step is a STUB (no image/audio codecs in this
  * environment): `fakeDecodeFeatures` derives a deterministic feature
  * vector from the raw bytes. Everything around it — the schema
  * contract, the per-partition batch processing, the partitioning
  * behavior — is the real Spark plumbing a production decode UDF
  * would drop into (swap `fakeFeatures` for an actual codec call;
  * at 100 TB this is exactly the mapPartitions shape that amortizes
  * model/codec initialization per partition, not per row).
  */
object Multimodal {

  /** Media metadata carried alongside every binary column. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("source", StringType, nullable = true)))

  val featureDim = 8

  /** Attach a binary payload + metadata struct to a text corpus —
    * stands in for reading real image/audio blobs.
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String,
              mediaType: String = "text/plain"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      expr(s"encode($textCol, 'UTF-8')").as("bin"),
      struct(
        lit(mediaType).as("media_type"),
        expr(s"octet_length(encode($textCol, 'UTF-8'))").as("n_bytes"),
        col(idCol).cast("string").as("source")).as("meta"))

  /** Deterministic stand-in for a codec: average byte value per
    * 1/featureDim stripe of the payload, scaled to [0,1].
    */
  private[ops] def fakeFeatures(bytes: Array[Byte]): Array[Float] = {
    if (bytes.isEmpty) return Array.fill(featureDim)(0f)
    val stripe = math.max(bytes.length / featureDim, 1)
    (0 until featureDim).map { i =>
      val from = math.min(i * stripe, bytes.length)
      val until = if (i == featureDim - 1) bytes.length
                  else math.min((i + 1) * stripe, bytes.length)
      if (until <= from) 0f
      else {
        var s = 0L; var j = from
        while (j < until) { s += (bytes(j) & 0xff); j += 1 }
        (s.toDouble / (until - from) / 255.0).toFloat
      }
    }.toArray
  }

  /** Decode + feature-extract stage: mapPartitions so a real codec /
    * model handle is initialized once per partition. Output schema:
    * (media_id, features array<float>, n_bytes int).
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bin"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: initialize codec/model HERE, once per partition
        rows.map { case (id, bytes) => (id, fakeFeatures(bytes), bytes.length) }
      }
      .toDF("media_id", "features", "n_bytes")
  }

  /** Frame-sample stage stub: pick every `stride`-th 16-byte block as
    * a "frame" (stands in for video frame sampling; the plumbing —
    * explode to one row per frame with an index — is the real shape).
    */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame =
    media.select(col("media_id"), col("bin"),
      expr(s"octet_length(bin)").as("n_bytes"))
      .withColumn("frame_idx",
        explode(expr(s"sequence(0, greatest(cast(octet_length(bin) / 16 / $stride as int) - 1, 0))")))
      .select(col("media_id"), col("frame_idx"),
        expr(s"substring(hex(bin), frame_idx * $stride * 32 + 1, 32)").as("frame_hex"))
}
