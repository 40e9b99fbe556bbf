package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a subset of SparkEntry queries without paying the full
  * 58-query bench sweep. `runMain graft.TimeQueries <sfDir> <q1> <q2> ...`
  * — two timed passes per query (same min-of-2 discipline as graft.Bench),
  * cache cleared between passes. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    // warmup (JIT/codegen/parquet footers)
    graft.queries.Queries.fwdGeocode(spark, sfDir).count()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val secs = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        (s, n)
      }
      println(f"[time] $name%-24s ${secs.map(_._1).min}%7.3f s  rows=${secs.head._2}")
    }
    spark.stop()
  }
}
