package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F
import graft.ops.Geocode
import graft.ops.Geocode.IndexLevel

/** Throwaway profiling main (not part of the library surface). */
object Scratch {
  // coalesceN with per-level persist of the capped chain pool
  def coalesceNP(m: DataFrame, levels: Seq[IndexLevel],
                 cap: Int = Geocode.StackRegionCap): DataFrame = {
    val emptyToks = array().cast("array<string>")
    val emptyIds = array().cast("array<bigint>")
    var pool: Option[DataFrame] = None
    var out: Option[DataFrame] = None
    levels.zipWithIndex.foreach { case (IndexLevel(typ, zoom), i) =>
      val cands = m.filter(col("typ") === typ)
        .withColumn("cell", F.cellAt(lit(zoom), col("glon"), col("glat")))
      val chained = pool match {
        case None =>
          cands.withColumn("chain_ids", array(col("gid")))
            .withColumn("utoks", array_distinct(split(col("name"), " ")))
            .withColumn("ctx", lit(-1L))
        case Some(p) =>
          val prevZooms = levels.take(i).map(_.zoom)
          val poolSide = p.select(col("doc_id").as("p_doc_id"), col("cell").as("p_cell"),
            col("leaf_zoom").as("p_zoom"), col("gid").as("p_gid"),
            col("chain_ids").as("p_chain"), col("utoks").as("p_utoks"), col("wc").as("p_wc"))
          cands
            .withColumn("anc", explode(array(prevZooms.map(z =>
              struct(lit(z).as("az"),
                F.cellAt(lit(z), col("glon"), col("glat")).as("acell"))): _*)))
            .join(poolSide.hint("shuffle_hash"),
              col("doc_id") === col("p_doc_id") &&
                (col("anc.az") - col("p_zoom") === 0) &&
                (col("anc.acell") - col("p_cell") === 0),
              "left")
            .withColumn("rn", row_number().over(
              Window.partitionBy(col("doc_id"), col("gid"))
                .orderBy(col("p_wc").desc_nulls_last, col("p_zoom").desc_nulls_last,
                  col("p_gid").asc_nulls_last)))
            .filter(col("rn") === 1)
            .withColumn("chain_ids", concat(coalesce(col("p_chain"), emptyIds), array(col("gid"))))
            .withColumn("utoks",
              array_distinct(concat(coalesce(col("p_utoks"), emptyToks), split(col("name"), " "))))
            .withColumn("ctx", coalesce(col("p_gid"), lit(-1L)))
            .drop("anc", "rn", "p_doc_id", "p_cell", "p_zoom", "p_gid",
              "p_chain", "p_utoks", "p_wc")
      }
      val withW = chained
        .withColumn("wc", size(col("utoks")) / lit(3.0))
        .withColumn("leaf_zoom", lit(zoom))
        .persist()
      val capped = withW
        .withColumn("rcap", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("wc").desc, col("gid").asc)))
        .filter(col("rcap") <= cap)
        .drop("rcap")
      pool = Some(pool.map(_.unionByName(capped)).getOrElse(capped))
      out = Some(out.map(_.unionByName(withW)).getOrElse(withW))
    }
    out.get.select(col("doc_id"), col("gid").as("feature_id"), col("name"), col("typ"),
      col("wc").as("relev"), col("cell"), col("ctx"),
      concat_ws(">", transform(col("chain_ids"), x => x.cast("string"))).as("chain"),
      col("score"), col("glon"), col("glat"), col("qlon"), col("qlat"))
  }

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
    import graft.queries.Queries
    for (rep <- 1 to 2) {
      spark.catalog.clearCache()
      time(s"multi base #$rep")(Queries.fwdGeocodeMulti(spark, sfDir).count())
      spark.catalog.clearCache()
      val m = Geocode.mentions(graft.synth.Synth.docPages(spark, sfDir),
        graft.synth.Synth.gazMultiDf(spark)).persist()
      time(s"multi persistLvl #$rep")(
        Geocode.rank(coalesceNP(m, Geocode.DefaultLevels), extraCols = Seq("chain")).count())
    }
    spark.stop()
  }
}
