package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.index.IndexBuild

/** J: incremental index maintenance as Structured Streaming (SURVEY.md §2.J
  * — optional extension; the reference indexes via a back-pressured Node
  * object stream, re-expressed here as micro-batch upserts).
  *
  * A stream of feature rows `(feature_id, phrase, score, geom_wkb)` is
  * turned into grid entries per micro-batch (same derivation as the batch
  * [[IndexBuild.gridEntries]]) and appended to the index table partitioned
  * by batch — an Iceberg table would take these as proper upsert commits;
  * the parquet-append emulation keeps the same idempotence contract via the
  * (batch_id) subdir (reprocessing a batch overwrites, not duplicates).
  */
object StreamingIndex {

  def start(spark: SparkSession, features: DataFrame, z: Int,
            outDir: String, checkpointDir: String): StreamingQuery =
    features.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          IndexBuild.gridEntries(batch, z)
            .write.mode("overwrite")
            .parquet(s"$outDir/batch=$batchId")
        }
        ()
      }
      .start()

  /** Watermarked per-window mention-rate aggregation over a stream of
    * (warc_ts, url) page arrivals — the streaming-side E6 metrics shape. */
  def pageRate(pages: DataFrame, watermark: String = "10 minutes",
               window: String = "5 minutes"): DataFrame =
    pages
      .withWatermark("warc_ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("warc_ts"), window))
      .agg(count(lit(1)).as("pages"))
      .select(col("window.start").as("win_start"), col("pages"))
}
