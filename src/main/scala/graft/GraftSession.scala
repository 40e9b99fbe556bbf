package graft

import org.apache.spark.sql.SparkSession

/** Recommended session configuration for this engine.
  *
  * Local runs derive everything from the core count; on a real cluster the
  * same knobs come from spark-submit. The settings matter at the 10^12-row
  * design point:
  *  - AQE on (runtime re-plan; coalesces the post-shuffle partitions of the
  *    window stages),
  *  - shuffle partitions sized to cores locally (cluster: 2-3× total cores),
  *  - 128 MiB input split target so the pages table scans with full
  *    parallelism,
  *  - broadcast threshold left at default: the gazetteer/phrase-dict SHOULD
  *    broadcast, the per-doc join sides are hinted shuffle-hash explicitly
  *    in the operators (never rely on estimates for those).
  */
object GraftSession {
  def local(cores: Int, appName: String = "carmenspark"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(s)
    s
  }
}
