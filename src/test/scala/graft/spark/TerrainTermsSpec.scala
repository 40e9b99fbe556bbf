package graft.spark

import org.apache.spark.sql.functions._
import graft.core.CellMath
import graft.queries.Queries

/** Horn slope/aspect and regional log-odds vocabulary vs dense-map
  * re-derivations at sf0.001 (the scatter/join plans must agree with the
  * obvious sequential computation). */
class TerrainTermsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("slope_aspect: scatter-join gradient equals the dense-map Horn kernel") {
    val evs = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id")).collect().map(_.getLong(0))
    def lon(id: Long) = ((id * 7919) % 360000) / 1000.0 - 180.0
    def lat(id: Long) = ((id * 104729) % 160000) / 1000.0 - 80.0
    val z = evs.groupBy(id => CellMath.lonLatToCell(6, lon(id), lat(id)))
      .map { case (c, ids) => c -> ids.length.toLong }
    def at(x: Long, y: Long): Long =
      if (x < 0 || x >= 64 || y < 0 || y >= 64) 0L
      else z.getOrElse(CellMath.pack(6, x, y), 0L)
    val out = Queries.slopeAspect(spark, sf).collect()
    assert(out.length == z.size)
    out.foreach { r =>
      val c = r.getLong(0); val x = CellMath.xOf(c); val y = CellMath.yOf(c)
      val gx = (at(x + 1, y - 1) + 2 * at(x + 1, y) + at(x + 1, y + 1)) -
        (at(x - 1, y - 1) + 2 * at(x - 1, y) + at(x - 1, y + 1))
      val gy = (at(x - 1, y + 1) + 2 * at(x, y + 1) + at(x + 1, y + 1)) -
        (at(x - 1, y - 1) + 2 * at(x, y - 1) + at(x + 1, y - 1))
      assert(r.getLong(2) == gx && r.getLong(3) == gy, s"cell $c")
      val slope = math.atan(math.sqrt(gx.toDouble * gx + gy.toDouble * gy) / 800.0) * 180.0 / math.Pi
      assert(math.abs(r.getDouble(4) - slope) < 1e-3)
    }
  }

  test("region_terms: top-5 log-odds terms equal the brute per-cell ranking") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
    val ct = scala.collection.mutable.Map.empty[(Long, String), Long]
    docs.foreach { r =>
      val id = r.getLong(0)
      val cell = CellMath.lonLatToCell(4,
        ((id * 7919) % 360000) / 1000.0 - 180.0,
        ((id * 104729) % 140000) / 1000.0 - 70.0)
      r.getString(1).split(' ').foreach(t => ct((cell, t)) = ct.getOrElse((cell, t), 0L) + 1)
    }
    val nC = ct.groupBy(_._1._1).map { case (c, m) => c -> m.values.sum }
    val kT = ct.groupBy(_._1._2).map { case (t, m) => t -> m.values.sum }
    val nn = ct.values.sum
    val expect = ct.keys.groupBy(_._1).map { case (cell, keys) =>
      cell -> keys.toSeq.map { case (_, t) =>
        val k = ct((cell, t))
        val s = math.log((k + 1).toDouble / (nC(cell) - k + 1).toDouble) -
          math.log((kT(t) + 1).toDouble / (nn - kT(t) + 1).toDouble)
        (t, s)
      }.sortBy { case (t, s) => (-s, t) }.take(5).zipWithIndex
        .map { case ((t, _), i) => (i + 1L, t) }
    }
    val got = Queries.regionTerms(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (c, rs) => c -> rs.map(r => (r.getLong(1), r.getString(2))).sortBy(_._1).toSeq }
    assert(got.keySet == expect.keySet)
    expect.foreach { case (c, e) => assert(got(c) == e, s"cell $c") }
  }
}
