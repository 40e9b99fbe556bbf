package graft

import org.apache.spark.sql.SparkSession
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
    for (q <- Seq("fuzzy_mentions"); rep <- 1 to 2)
      time(s"$q#$rep")(SparkEntry.queries(q)(spark, sfDir).count())
    // stage breakdown of fuzzyMentions
    import graft.functions.F
    import graft.queries.Queries
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val gaz = graft.synth.Synth.gazDf(spark)
    val toks = docs
      .select(col("doc_id"), explode(array_distinct(F.tokenize(col("text")))).as("tok"))
    time("single toks explode")(toks.count())
    val multi = gaz.filter(col("name").contains(" "))
      .withColumn("ntoks", split(col("name"), " "))
      .withColumn("len_l", size(col("ntoks")))
    val lengths = multi.select(col("len_l")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    println(s"[scratch] lengths=$lengths gazMulti=${multi.count()} gazSingle=${gaz.filter(!col("name").contains(" ")).count()}")
    val wins = docs
      .select(col("doc_id"), explode(F.windowStrings(col("text"), lengths)).as("w"))
      .withColumn("wtoks", split(col("w"), " "))
      .withColumn("len_l", size(col("wtoks")))
    time("wins")(wins.count())
    val winKeys = wins
      .withColumn("p", explode(sequence(lit(0), col("len_l") - 1)))
      .withColumn("btok", element_at(col("wtoks"), col("p") + 1))
      .select(col("doc_id"), col("w"), col("len_l"), col("p"),
        explode(graft.functions.F.delKeys(col("btok"))).as("dk"))
    time("winKeys")(winKeys.count())
    val freq = Queries.freqIndex(spark, sfDir)
    time("freqIndex")(freq.count())
    // ORIGINAL wins construction (per-length unions + dropDuplicates)
    val dtoks = docs.select(col("doc_id"), F.tokenize(col("text")).as("toks"))
    val winsOld = lengths.map { l =>
      dtoks.select(col("doc_id"),
        explode(when(size(col("toks")) >= l,
          transform(sequence(lit(1), size(col("toks")) - lit(l - 1)),
            i => slice(col("toks"), i, lit(l))))
          .otherwise(array().cast("array<array<string>>"))).as("wtoks"))
        .withColumn("len_l", lit(l))
    }.reduce(_ unionByName _)
      .withColumn("w", array_join(col("wtoks"), " "))
      .dropDuplicates("doc_id", "w")
    time("winsOld")(winsOld.count())
    val winKeysOld = winsOld
      .withColumn("p", explode(sequence(lit(0), col("len_l") - 1)))
      .withColumn("btok", element_at(col("wtoks"), col("p") + 1))
      .select(col("doc_id"), col("w"), col("len_l"), col("p"),
        explode(graft.functions.F.delKeys(col("btok"))).as("dk"))
    time("winKeysOld")(winKeysOld.count())
    for (rep <- 1 to 2)
      time(s"fuzzy_mentions_again#$rep")(SparkEntry.queries("fuzzy_mentions")(spark, sfDir).count())
    spark.stop()
  }
}
