package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    import graft.ops.TextOps
    val docs = TextOps.withMutatedCopies(graft.synth.Synth.docPages(spark, sfDir))
    docs.persist().count()
    // stage 1: candidates only
    val t = docs.select(col("doc_id"), col("lang"),
      (col("n_chars") / 100).cast("long").as("bucket"),
      array_distinct(graft.functions.F.tokenize(col("text"))).as("toks"))
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    t.count()
    val df_ = t.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val bc = spark.sparkContext.broadcast(graft.index.TermStats.build(df_))
    val pref = t.select(col("lang"), col("bucket"), col("doc_id"),
      explode(graft.index.TermStats.prefixTokens(col("toks"), 0.5, bc)).as("tok"))
    time("prefix explode")(pref.count())
    val cand = pref.select(col("lang"), col("bucket"), col("tok"), col("doc_id").as("a"))
      .join(pref.select(col("lang"), col("bucket"), col("tok"), col("doc_id").as("b")),
        Seq("lang", "bucket", "tok"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct().persist()
    time("candidates")(cand.count())
    time("verify join (strings)")(
      cand.join(t.select(col("doc_id").as("a"), col("toks").as("ta")), "a")
        .join(t.select(col("doc_id").as("b"), col("toks").as("tb")), "b")
        .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
        .withColumn("uni", size(col("ta")) + size(col("tb")) - col("inter"))
        .filter(col("inter") / col("uni").cast("double") >= 0.5).count())
    val th = t.select(col("doc_id"),
      sort_array(transform(col("toks"), x => xxhash64(x))).as("h"),
      size(col("toks")).as("nt")).persist()
    th.count()
    time("verify join (hashed)")(
      cand.join(th.select(col("doc_id").as("a"), col("h").as("ha"), col("nt").as("na")), "a")
        .join(th.select(col("doc_id").as("b"), col("h").as("hb"), col("nt").as("nb")), "b")
        .withColumn("inter", graft.functions.F.sortedInterCount(col("ha"), col("hb")))
        .withColumn("uni", col("na") + col("nb") - col("inter"))
        .filter(col("inter") / col("uni").cast("double") >= 0.5).count())
    // full query for reference
    time("full ngramJaccard")(TextOps.ngramJaccard(docs).count())
    spark.stop()
  }
}
