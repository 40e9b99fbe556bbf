package graft.spark

import org.apache.spark.sql.functions._
import graft.ops.Geocode
import graft.synth.Synth
import scala.jdk.CollectionConverters._

/** In-repo golden fixtures (FIXTURES.md §5): frozen expected rows for the
  * forward and reverse pipelines on fixed inputs. Regenerate ONLY via
  * `sbt "Test/runMain graft.spark.RegenGoldens"` after an intentional
  * semantic change — never silently. */
class GoldenSpec extends SparkTestBase {

  test("forward geocode matches the committed golden rows") {
    val got = Goldens.forwardRows(spark)
    val want = Goldens.read("forward.golden")
    assert(got == want,
      s"forward drifted.\n got=${got.take(5).mkString("\n")}\nwant=${want.take(5).mkString("\n")}")
  }

  test("reverse context matches the committed golden rows") {
    val got = Goldens.reverseRows(spark)
    val want = Goldens.read("reverse.golden")
    assert(got == want)
  }
}

object Goldens {
  /** 8 fixed pages exercising: bigram+region stack, region-only, fuzzy-free
    * singles, no-mention, multi-stack. */
  def pages(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    Seq(
      (1L, "the hash join data pipeline", 10.0, 20.0),
      (2L, "spark streaming with sort merge and big data", -50.0, 0.0),
      (3L, "nothing relevant here xyzzy", 0.0, 0.0),
      (4L, "table scan inside the table", 100.0, -30.0),
      (5L, "key value store vs row filter in a vector batch", 170.0, 60.0),
      (6L, "customer group order line part", -120.0, -45.0),
      (7L, "window query window agg window", 30.0, 30.0),
      (8L, "fast scan slow scan fast", -10.0, 55.0)
    ).toDF("doc_id", "text", "qlon", "qlat")
  }

  def forwardRows(spark: org.apache.spark.sql.SparkSession): List[String] =
    Geocode.forward(pages(spark), Synth.gazDf(spark))
      .orderBy("doc_id", "rank")
      .collect()
      .map(r => s"${r.getLong(0)}|${r.getLong(1)}|${r.getString(2)}|${r.getDouble(3)}|${r.getLong(4)}|${r.getLong(5)}|${r.getDouble(6)}|${r.getInt(7)}")
      .toList

  def points(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    // first 12 synthetic event points (same derivation as Synth.eventPoints)
    (0L until 12L).map { id =>
      (id, (id * 7919 % 360000) / 1000.0 - 180.0, (id * 104729 % 160000) / 1000.0 - 80.0)
    }.toDF("event_id", "elon", "elat")
  }

  def reverseRows(spark: org.apache.spark.sql.SparkSession): List[String] =
    Geocode.contextChain(points(spark), Seq(
      ("country", Synth.nationFeatures(spark, "/root/testdata/sf0.001"), 6),
      ("place", Synth.custFeatures(spark, "/root/testdata/sf0.001"), 8)))
      .orderBy("event_id", "typ")
      .collect()
      .map(r => s"${r.getLong(0)}|${r.getString(1)}|${r.getLong(2)}")
      .toList

  def goldenPath(name: String) =
    java.nio.file.Paths.get("src/test/resources/golden", name)

  def read(name: String): List[String] = {
    val url = getClass.getClassLoader.getResource(s"golden/$name")
    require(url != null, s"missing golden $name — run Test/runMain graft.spark.RegenGoldens")
    scala.io.Source.fromURL(url, "UTF-8").getLines().toList
  }
}

/** Explicit regeneration entry (never run implicitly). */
object RegenGoldens {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.session
    java.nio.file.Files.createDirectories(Goldens.goldenPath("x").getParent)
    java.nio.file.Files.write(Goldens.goldenPath("forward.golden"),
      Goldens.forwardRows(spark).asJava)
    java.nio.file.Files.write(Goldens.goldenPath("reverse.golden"),
      Goldens.reverseRows(spark).asJava)
    println("goldens regenerated")
    spark.stop()
  }
}
