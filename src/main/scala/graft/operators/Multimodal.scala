package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract /
  * frame-sample as partition-local batch functions.
  *
  * The Spark-side shape is real and tested — schema, partition-local
  * batching via `mapPartitions` on a typed Dataset (the JVM analog of
  * `mapInPandas`: one iterator per partition, amortized per-batch setup,
  * no per-row UDF dispatch), deterministic output — while the actual
  * codec call is a clearly-marked STUB (`fakeDecode`): image/audio
  * libraries are not available in this environment, so the "decoder"
  * derives features from the bytes themselves, deterministically.
  *
  * Scale notes: decode is embarrassingly parallel (narrow, no shuffle);
  * the expensive codec sits inside a mapPartitions so per-partition model/
  * codec initialization happens once per task, not once per row. Feature
  * vectors come back as fixed-width arrays ready for Similarity's
  * LSH/top-k operators.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, byte_len: Int,
                                 format: String, width: Int, height: Int,
                                 features: Array[Float])

  val FeatureDim = 16

  /** STUB decoder — stands in for an image/audio codec. Deterministic pure
    * function of the payload bytes: "format" from a magic-byte sniff,
    * fake dimensions from the length, features = per-stripe byte means. */
  def fakeDecode(payload: Array[Byte]): (String, Int, Int, Array[Float]) = {
    val fmt =
      if (payload.length >= 2 && payload(0) == 0xFF.toByte && payload(1) == 0xD8.toByte) "jpeg"
      else if (payload.length >= 4 && payload(0) == 0x89.toByte && payload(1) == 'P') "png"
      else "raw"
    val w = math.max(1, payload.length % 640)
    val h = math.max(1, payload.length % 480)
    val feats = new Array[Float](FeatureDim)
    if (payload.nonEmpty) {
      val stripe = math.max(1, payload.length / FeatureDim)
      var i = 0
      while (i < FeatureDim) {
        var s = 0L; var n = 0
        var j = i * stripe
        val end = math.min(payload.length, j + stripe)
        while (j < end) { s += (payload(j) & 0xFF); n += 1; j += 1 }
        feats(i) = if (n == 0) 0f else s.toFloat / n
        i += 1
      }
    }
    (fmt, w, h, feats)
  }

  /** Decode a binary media column into typed features, batched per
    * partition (one codec init per task — the `mapInPandas` shape). */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition (per-task) codec/model initialization goes here
      it.map { r =>
        val (fmt, w, h, feats) = fakeDecode(r.payload)
        MediaFeatures(r.doc_id, r.payload.length, fmt, w, h, feats)
      }
    }
  }

  /** Documents-table driver: texts as stand-in payloads. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
    decodeFeatures(media).toDF().orderBy("doc_id")
  }

  /** Integer-exact slice of the decode (format sniff + fake dimensions),
    * via the REAL mapPartitions path — so the driver's DuckDB gate
    * exercises the multimodal plumbing, not just its schema. The float
    * feature vectors stay out of the gate (engine-specific rounding) and
    * are covered by the determinism spec instead. */
  def qDecodeMeta(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir)
      .select("doc_id", "byte_len", "format", "width", "height")
      .orderBy("doc_id")

  /** DuckDB recomputation of the stub decode's integer outputs: text
    * payloads never match an image magic ("raw"), dims are len-derived. */
  val qDecodeMetaOracle: String =
    """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS len FROM documents)
SELECT doc_id, len AS byte_len, 'raw' AS format,
  greatest(len % 640, 1) AS width, greatest(len % 480, 1) AS height
FROM d ORDER BY doc_id"""

  // -------------------------------------------------------------------
  // Frame sampling: slice the opaque binary payload into fixed-width
  // frames and keep every SampleEvery-th one — the video-frame-sample /
  // audio-chunk shape, as REAL binary slicing (only the codec decode
  // itself is stubbed). Narrow per-row explode, no shuffle; frame width
  // and stride are the partition-size knobs at 100 TB.
  // -------------------------------------------------------------------

  val FrameBytes = 64
  val SampleEvery = 4

  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .withColumn("n_frames",
        ceil(octet_length(col("payload")) / lit(FrameBytes.toDouble)).cast("int"))
    d.filter(col("n_frames") > 0)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(SampleEvery)))
          .as("frame_idx"))
      .withColumn("frame",
        expr(s"substring(payload, frame_idx * $FrameBytes + 1, $FrameBytes)"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        octet_length(col("frame")).as("frame_len"),
        md5(col("frame")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Oracle over the TEXT form (payloads are ASCII, so byte slicing ==
    * char slicing and md5(blob) == md5(varchar) on identical bytes —
    * PipelineSpec asserts the byte_len == n_chars premise). */
  val frameSampleOracle: String =
    s"""WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
f AS (SELECT doc_id, text,
        unnest(range(0, CAST(ceil(len / $FrameBytes.0) AS BIGINT), $SampleEvery)) AS frame_idx
      FROM d WHERE len > 0)
SELECT doc_id, frame_idx,
  length(substr(text, CAST(frame_idx * $FrameBytes + 1 AS BIGINT), $FrameBytes)) AS frame_len,
  md5(substr(text, CAST(frame_idx * $FrameBytes + 1 AS BIGINT), $FrameBytes)) AS frame_md5
FROM f ORDER BY doc_id, frame_idx"""
}
