package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F
import graft.ops.TextOps

/** Throwaway profiling main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
    }
    def winnow(docs: DataFrame, rr: Boolean): DataFrame = {
      val k = 8; val w = 16; val minShared = 2; val maxBucket = 1000
      val base = TextOps.exactReps(docs)
        .select(col("doc_id"), explode(F.winnowFps(col("text"), k, w)).as("fp"))
      val fps = (if (rr) base.repartition(spark.sparkContext.defaultParallelism) else base)
        .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("fp"))))
        .filter(col("bsz") <= maxBucket)
        .drop("bsz")
        .persist()
      fps.select(col("fp"), col("doc_id").as("a"))
        .join(fps.select(col("fp"), col("doc_id").as("b")), "fp")
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= minShared)
    }
    val docs = TextOps.withMutatedCopies(spark.read.parquet(s"$sfDir/documents.parquet"))
    for (rep <- 1 to 2; rr <- Seq(true, false)) {
      spark.catalog.clearCache()
      time(s"winnow rr=$rr #$rep")(winnow(docs, rr).count())
    }
    spark.stop()
  }
}
