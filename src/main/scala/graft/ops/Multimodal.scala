package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * decoded in partition-sized batches.
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * container) with a deterministic fake keyed on payload bytes — the
  * Spark-side plumbing (schema, batched mapPartitions, partitioning) is
  * real and tested. Swap [[decodeStub]] for a real decoder (e.g. JNI into
  * libjpeg / ffmpeg) without touching the pipeline shape.
  */
object Multimodal {

  final case class MediaPayload(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, byte_len: Long, width: Long,
                             height: Long, channels: Long, est_frames: Long)

  /** STUB decoder: deterministic fake metadata from payload length. A real
    * decoder would parse the container header here; per-partition batching
    * (one decoder init per partition, not per row) is the part that matters
    * for the pipeline shape. */
  def decodeStub(p: MediaPayload): MediaMeta = {
    val n = p.payload.length.toLong
    MediaMeta(p.doc_id, n, n % 640 + 16, (n * 7) % 480 + 16, 3, n / 1024 + 1)
  }

  /** documents.text → fake binary payload → batched decode → typed metadata.
    * mapPartitions keeps the (stubbed) decoder initialization per-partition,
    * mirroring how a Pandas-UDF/Arrow batch decoder would run. */
  def decodeMeta(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val payloads: Dataset[MediaPayload] = docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaPayload]
    payloads.mapPartitions { it =>
      // real decoder: init native context once per partition here
      it.map(decodeStub)
    }.toDF()
  }

  final case class Thumb(doc_id: Long, w: Long, h: Long, thumb: Array[Byte])
  final case class Frame(doc_id: Long, frame_idx: Long, frame_ts_ms: Long)

  /** STUB resize: an 8×8×3 "thumbnail" whose bytes are a deterministic
    * function of the payload (a real impl decodes + box-filters here;
    * the batch shape, output schema and byte budget are the real contract). */
  def resizeStub(p: MediaPayload): Thumb = {
    val out = new Array[Byte](8 * 8 * 3)
    var i = 0
    var h = 1125899906842597L
    while (i < out.length) {
      h = h * 31 + (if (p.payload.length > 0) p.payload(i % p.payload.length) else 0)
      out(i) = (h >>> 16).toByte
      i += 1
    }
    Thumb(p.doc_id, 8, 8, out)
  }

  def resize(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaPayload]
      .mapPartitions(_.map(resizeStub))
      .toDF()
  }

  /** STUB frame sampling: one row per sampled frame (every ~1 KiB of payload
    * = one fake frame at 40 ms spacing) — the explode shape a video pipeline
    * produces, as a flatMap over partition batches. */
  def frameSample(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaPayload]
      .mapPartitions(_.flatMap { p =>
        val n = p.payload.length.toLong / 1024 + 1
        (0L until n).iterator.map(i => Frame(p.doc_id, i, i * 40))
      })
      .toDF()
  }

  final case class FeatureVec(doc_id: Long, f0: Long, f1: Long, f2: Long, f3: Long,
                              f4: Long, f5: Long, f6: Long, f7: Long)

  /** Feature extraction over the opaque payload: an 8-bin byte histogram
    * (bin = byte >> 5) computed per partition batch — the feature-extract
    * stage of the multimodal pipeline. Unlike the decode/resize stubs this
    * is REAL math on the real bytes (and exactly mirrorable in SQL for
    * ASCII payloads), so the oracle checks values, not just plumbing. */
  def featureStub(p: MediaPayload): FeatureVec = {
    val bins = new Array[Long](8)
    var i = 0
    while (i < p.payload.length) {
      bins((p.payload(i) & 0xff) >> 5) += 1
      i += 1
    }
    FeatureVec(p.doc_id, bins(0), bins(1), bins(2), bins(3),
      bins(4), bins(5), bins(6), bins(7))
  }

  def features(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaPayload]
      .mapPartitions(_.map(featureStub))
      .toDF()
  }

  def featuresSql: String = {
    val cols = (0 until 8).map(b =>
      s"CAST(len(list_filter(string_split(text, ''), c -> ascii(c) // 32 = $b)) AS BIGINT) AS f$b")
      .mkString(",\n       ")
    s"""SELECT doc_id,
       |       $cols
       |FROM documents""".stripMargin
  }

  def frameSampleSql: String =
    s"""SELECT d.doc_id, g.i AS frame_idx, g.i * 40 AS frame_ts_ms
       |FROM documents d,
       |LATERAL (SELECT unnest(generate_series(0,
       |  CAST(octet_length(CAST(d.text AS BLOB)) // 1024 AS BIGINT))) AS i) g""".stripMargin

  def decodeMetaSql: String =
    s"""SELECT doc_id,
       |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
       |       CAST(octet_length(CAST(text AS BLOB)) % 640 + 16 AS BIGINT) AS width,
       |       CAST((octet_length(CAST(text AS BLOB)) * 7) % 480 + 16 AS BIGINT) AS height,
       |       CAST(3 AS BIGINT) AS channels,
       |       CAST(octet_length(CAST(text AS BLOB)) // 1024 + 1 AS BIGINT) AS est_frames
       |FROM documents""".stripMargin
}
