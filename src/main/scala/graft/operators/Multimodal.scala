package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media item: the real schema a decode stage emits. */
case class MediaFeature(doc_id: Long, n_bytes: Int, kind: String,
    checksum: Long, feature: Array[Double])

/** Multimodal column plumbing (north-star X5; SURVEY.md §2.12): media
  * payloads are opaque `binary` columns with a typed metadata struct
  * alongside; decode / feature-extraction runs batched per partition.
  *
  * The Spark-side mechanics here — schema, partition-local batching via
  * `mapPartitions`, typed output `Dataset[MediaFeature]` — are the real
  * production shape. The decode itself is a clearly-marked DETERMINISTIC
  * STUB (no image/audio codecs exist in this environment): it derives a
  * fake feature vector from the bytes. Swapping in a real codec changes
  * only the body of [[decodeStub]].
  *
  * Scale notes: payload bytes never hit the driver; the featurize stage is
  * map-only (no shuffle); a real deployment would co-locate decode with the
  * scan and cap `spark.sql.files.maxPartitionBytes` so one partition's
  * batch of media fits executor memory.
  */
object Multimodal {

  /** Attach the opaque payload + typed metadata. (Here the payload is the
    * UTF-8 text bytes standing in for an image/audio blob.) */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs
      .withColumn("media", col("text").cast("binary"))
      .withColumn("media_meta", struct(
        length(col("media")).as("n_bytes"),
        lit("text/plain").as("mime"),
        col("source").as("origin")))

  /** STUB decoder — deterministic fake: an 8-bin byte histogram as the
    * "feature vector" and a rolling checksum. A real implementation would
    * decode the codec here (per-partition, reusing a decoder instance). */
  private def decodeStub(bytes: Array[Byte]): (Long, Array[Double]) = {
    val hist = new Array[Double](8)
    var crc = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      hist(b % 8) += 1.0
      crc = (crc * 31 + b) % 2147483647L
      i += 1
    }
    (crc, hist)
  }

  /** Batched decode/featurize over the binary column. */
  def decodeFeatures(withPayload: DataFrame)(
      implicit spark: SparkSession): Dataset[MediaFeature] = {
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("media"), col("media_meta.mime").as("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // per-partition setup would init a real decoder once, here
        it.map { case (id, bytes, mime) =>
          val (crc, feat) = decodeStub(bytes)
          MediaFeature(id, bytes.length, mime, crc, feat)
        }
      }
  }
}
