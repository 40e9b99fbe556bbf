package graft.spark

import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import graft.queries.Queries
import graft.synth.Synth

/** Overlay clip length vs an independent JTS intersection at sf0.001: the
  * Liang–Barsky parametric clip must agree with JTS's line×polygon
  * intersection length for every zone (1e-6-degree tolerance). */
class ClipSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("clip_length agrees with JTS line-in-rect intersection lengths") {
    val gf = new GeometryFactory()
    val segs = (0L until 1000L).map { r =>
      val ax = r * 7919 % 352000 - 176000
      val ay = r * 104729 % 152000 - 76000
      val bx = ax + (r * 31 % 81 - 40) * 100
      val by = ay + (r * 17 % 81 - 40) * 100
      gf.createLineString(Array(
        new Coordinate(ax.toDouble, ay.toDouble), new Coordinate(bx.toDouble, by.toDouble)))
    }
    val zones = Synth.custFeatures(spark, sf)
      .select(col("feature_id"),
        round(col("west") * 1000, 0).cast("long"),
        round(col("south") * 1000, 0).cast("long"),
        round(col("east") * 1000, 0).cast("long"),
        round(col("north") * 1000, 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val expect = zones.map { case (fid, w, s, e, n) =>
      val rect = gf.createPolygon(Array(
        new Coordinate(w.toDouble, s.toDouble), new Coordinate(e.toDouble, s.toDouble),
        new Coordinate(e.toDouble, n.toDouble), new Coordinate(w.toDouble, n.toDouble),
        new Coordinate(w.toDouble, s.toDouble)))
      fid -> segs.map(ls => ls.intersection(rect).getLength).sum
    }.filter(_._2 > 0).toMap
    val got = Queries.clipLength(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // zero-length degenerate clips can make the operator emit a zone JTS
    // scores 0 — compare on the union of keys with tolerance
    (expect.keySet ++ got.keySet).foreach { fid =>
      val e = expect.getOrElse(fid, 0.0)
      val g = got.getOrElse(fid, 0L).toDouble / 1000.0
      assert(math.abs(e - g) < 0.01 + e * 1e-6, s"feature $fid: jts=$e got=$g")
    }
    assert(expect.nonEmpty)
  }
}
