package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media item: the real schema a decode stage emits. */
case class MediaFeature(doc_id: Long, n_bytes: Int, kind: String,
    checksum: Long, feature: Array[Double])

/** One "resized" media item: payload transformed, metadata recomputed. */
case class ResizedMedia(doc_id: Long, media: Array[Byte], n_bytes: Int,
    orig_bytes: Int, scale: Double)

/** One sampled frame out of a media payload (video frame-sampling shape:
  * ONE media row fans out to MANY frame rows). */
case class MediaFrame(doc_id: Long, frame_no: Int, offset: Int,
    n_bytes: Int, checksum: Long)

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

  /** STUB resize: cap the payload at `maxBytes` by stride-sampling bytes
    * (deterministic; a real implementation decodes, scales, re-encodes).
    * Map-only like decode — the transform never shuffles. */
  def resize(withPayload: DataFrame, maxBytes: Int)(
      implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          if (bytes.length <= maxBytes)
            ResizedMedia(id, bytes, bytes.length, bytes.length, 1.0)
          else {
            val stride = math.ceil(bytes.length.toDouble / maxBytes).toInt
            val out = bytes.indices.collect {
              case i if i % stride == 0 => bytes(i)
            }.toArray
            ResizedMedia(id, out, out.length, bytes.length,
              out.length.toDouble / bytes.length)
          }
        }
      }
  }

  /** STUB frame sampler: treat the payload as fixed-size "frames" of
    * `frameBytes` and keep every `every`-th one — the 1-row→N-rows
    * generator shape of video frame extraction. flatMap (a typed
    * Generator) keeps it map-only; at scale the frame rows inherit the
    * parent's partitioning, so downstream per-frame featurization starts
    * without a shuffle. */
  def sampleFrames(withPayload: DataFrame, frameBytes: Int, every: Int)(
      implicit spark: SparkSession): Dataset[MediaFrame] = {
    import spark.implicits._
    require(frameBytes > 0 && every > 0)
    withPayload.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        (0 until nFrames by every).map { f =>
          val start = f * frameBytes
          val slice = bytes.slice(start, math.min(start + frameBytes, bytes.length))
          var crc = 0L
          slice.foreach(b => crc = (crc * 31 + (b & 0xff)) % 2147483647L)
          MediaFrame(id, f, start, slice.length, crc)
        }
      }
  }

  /** Cross-media duplicate-FRAME detection: [[sampleFrames]]' rolling
    * checksums grouped over the whole corpus — a (checksum, n_bytes)
    * seen in ≥ 2 distinct media is a shared frame (intro/outro cards,
    * watermarks, re-uploads), the video counterpart of q119's
    * duplicated text chunks. This is the DETECT prescreen: candidates
    * group by the 64-bit rolling checksum + length, and (as with every
    * hash prescreen in this library) an exact byte-compare verify pass
    * on the ≤ candidate rows closes the collision gap when the
    * downstream action is destructive. Map-only frame generation (the
    * flatMap inherits the scan's partitioning), ONE checksum-keyed
    * shuffle of frame rows, output bounded by duplicate groups. */
  def frameDedup(docs: DataFrame, frameBytes: Int, every: Int)(
      implicit spark: SparkSession): DataFrame =
    sampleFrames(withBinaryPayload(docs), frameBytes, every).toDF()
      .groupBy(col("checksum"), col("n_bytes"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_frames"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .filter(col("n_docs") >= 2)

  /** PERCEPTUAL AVERAGE-HASH (aHash) FRAME CLUSTERS — the classic
    * cheap perceptual fingerprint over the frame stream: each frame's
    * hash is one BIT PER BYTE, set when the byte is at or above the
    * frame's mean (compared exactly by cross-multiplying —
    * byte·n_bytes ≥ Σbytes — no division), so two frames that differ
    * only by a uniform brightness shift of magnitude below the
    * byte-to-mean gaps hash identically where [[frameDedup]]'s
    * exact checksum separates them. Frames are grouped by hash;
    * clusters touching ≥ 2 frames are the near-dup candidates a
    * video-ingest pipeline routes to fine verification. The hash is
    * a pure byte function of the deterministic decode stub, so the
    * DuckDB oracle replays every bit. Top `topN` clusters by
    * (n_frames DESC, ahash) — a total order (the hash string is
    * unique per group).
    *
    * Scale shape: map-only frame fan-out + ONE hash-keyed aggregate
    * with map-side partials + a TakeOrderedAndProject cut. */
  def aHashClusters(docs: DataFrame, frameBytes: Int, topN: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(frameBytes > 0 && topN > 0)
    val frames = withBinaryPayload(docs)
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        (0 until nFrames).map { f =>
          val start = f * frameBytes
          val slice = bytes.slice(start,
            math.min(start + frameBytes, bytes.length))
          var s = 0L
          slice.foreach(b => s += (b & 0xff))
          val h = slice.map(b =>
            if ((b & 0xff).toLong * slice.length >= s) '1' else '0')
            .mkString
          (id, f, h)
        }
      }
      .toDF("doc_id", "frame_no", "ahash")
    frames.groupBy(col("ahash"))
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(struct(col("doc_id"), col("frame_no"))).as("first"))
      .filter(col("n_frames") >= 2)
      .select(col("ahash"), col("n_frames"), col("n_docs"),
        col("first.doc_id").as("first_doc"),
        col("first.frame_no").as("first_frame"))
      .orderBy(col("n_frames").desc, col("ahash")).limit(topN)
  }

  /** SHOT-BOUNDARY DETECTION — the classic cut detector over the
    * frame stream: consecutive frames' feature histograms compared by
    * integer L1 distance, normalized per byte compared,
    *   cut_ppm = (Σ |h_i − h_prev,i|) · 10⁶ div (bytes + prev_bytes),
    * highest-contrast cuts first (a hard cut changes the whole
    * histogram → cut_ppm near 10⁶; consecutive frames of one shot
    * stay near 0). Frames and their 8-bin byte histograms come from
    * the same deterministic decode stub as [[decodeFeatures]] (a real
    * codec swap changes the histogram, not this plan); the histogram
    * is a pure byte function, so the DuckDB oracle replays every
    * distance — the multimodal path stays hash-verified, not
    * schema-only. Returns the top `topN` cuts by (cut_ppm DESC,
    * doc_id, frame_no) — a deterministic total order.
    *
    * Scale shape: map-only frame fan-out (inherits the scan's
    * partitioning), ONE per-media window (lag over frame_no —
    * media id is the parallel grain), a TakeOrderedAndProject cut. */
  def shotBoundaries(docs: DataFrame, frameBytes: Int, topN: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(frameBytes > 0 && topN > 0)
    val frames = withBinaryPayload(docs)
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        (0 until nFrames).map { f =>
          val start = f * frameBytes
          val slice = bytes.slice(start,
            math.min(start + frameBytes, bytes.length))
          val hist = new Array[Long](8)
          slice.foreach(b => hist((b & 0xff) % 8) += 1L)
          (id, f, slice.length, hist)
        }
      }
      .toDF("doc_id", "frame_no", "n_bytes", "hist")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_no"))
    frames
      .withColumn("ph", lag(col("hist"), 1).over(w))
      .withColumn("pb", lag(col("n_bytes"), 1).over(w))
      .filter(col("ph").isNotNull)
      .withColumn("dist", expr(
        "aggregate(zip_with(hist, ph, (a, b) -> abs(a - b)), 0L," +
          " (acc, x) -> acc + x)"))
      .select(col("doc_id"), col("frame_no"), col("dist"),
        expr("dist * 1000000 div (n_bytes + pb)").as("cut_ppm"))
      .orderBy(col("cut_ppm").desc, col("doc_id"), col("frame_no"))
      .limit(topN)
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

  /** Cross-modal retrieval over DECODED features — the downstream consumer
    * that makes the decode stage more than plumbing: k-NN by cosine over
    * the per-payload feature vectors ([[decodeFeatures]]'s 8-bin byte
    * histogram stub; a real codec swap changes the vector, not this
    * plan), reusing [[Similarity.knnJoin]] verbatim — media features are
    * just another embedding column once decoded. Zero-byte payloads are
    * excluded (no direction to compare). The stub feature is a pure
    * function of the bytes, so the DuckDB oracle replays the histogram
    * AND the ranking — the multimodal path is hash-verified end to end,
    * not schema-only. */
  def featureKnn(docs: DataFrame, nQueries: Int, k: Int)(
      implicit spark: SparkSession): DataFrame = {
    val feats = decodeFeatures(withBinaryPayload(docs)).toDF()
      .filter(col("n_bytes") > 0)
      .select(col("doc_id").as("vec_id"), col("feature").as("embedding"))
    Similarity.knnJoin(feats.filter(col("vec_id") >= nQueries),
      feats.filter(col("vec_id") < nQueries), k)
  }
}
