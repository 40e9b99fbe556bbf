package graft.spark

import org.apache.spark.sql.functions._
import graft.core.{CellMath, Geo}
import graft.ops.Raster
import graft.synth.Synth

/** H9 raster↔vector: mask agrees with PIP at pixel centers; vectorize
  * round-trips containment at pixel resolution. */
class RasterSpec extends SparkTestBase {

  private val cell = CellMath.lonLatToCell(8, 10.0, 50.0)
  private val (w, s, e, n) = CellMath.cellBounds(cell)
  // a rect covering roughly the middle quarter of the tile
  private val rect = Array(Array(
    w + 0.25 * (e - w), s + 0.25 * (n - s),
    e - 0.25 * (e - w), s + 0.25 * (n - s),
    e - 0.25 * (e - w), n - 0.25 * (n - s),
    w + 0.25 * (e - w), n - 0.25 * (n - s),
    w + 0.25 * (e - w), s + 0.25 * (n - s)))

  test("rasterize agrees with PIP at every pixel center") {
    val mask = Raster.rasterize(rect, cell)
    var mismatches = 0
    val z = CellMath.zOf(cell)
    for (py <- 0 until Raster.Px; px <- 0 until Raster.Px) {
      val lon = w + (px + 0.5) / Raster.Px * (e - w)
      val ty = CellMath.yOf(cell).toDouble + (py + 0.5) / Raster.Px
      val lat = math.atan(math.sinh(math.Pi * (1.0 - 2.0 * ty / (1L << z).toDouble))) * 180.0 / math.Pi
      val bit = py * Raster.Px + px
      val inMask = (mask(bit >> 3) & (1 << (bit & 7))) != 0
      val inPoly = Geo.pointInRings(rect, lon, lat)
      if (inMask != inPoly) mismatches += 1
    }
    assert(mismatches == 0, s"$mismatches pixel disagreements")
    // area sanity: ~ (0.5)^2 of the tile
    val frac = Raster.popcount(mask).toDouble / (Raster.Px * Raster.Px)
    assert(math.abs(frac - 0.25) < 0.02, s"area fraction $frac")
  }

  test("vectorize: recovered quads cover exactly the set pixels") {
    val mask = Raster.rasterize(rect, cell)
    val rings = Raster.vectorize(mask, cell)
    assert(rings.nonEmpty)
    // every recovered quad lies within the rect bbox (pixel-snapped)
    rings.foreach { r =>
      var i = 0
      while (i < r.length) {
        assert(r(i) >= w - 1e-9 && r(i) <= e + 1e-9)
        i += 2
      }
    }
    // containment round-trip at a few interior probes
    val probes = Seq((0.5, 0.5), (0.3, 0.6), (0.7, 0.4), (0.1, 0.1), (0.9, 0.9))
    probes.foreach { case (fx, fy) =>
      val lon = w + fx * (e - w)
      val lat = s + fy * (n - s)
      val inRect = Geo.pointInRings(rect, lon, lat)
      val inQuads = rings.exists(q => Geo.pointInRings(Array(q), lon, lat))
      assert(inRect == inQuads, s"roundtrip at $fx,$fy")
    }
  }

  test("rasterTiles pipeline: masks per tile with popcounts") {
    val feats = Synth.custFeatures(spark, "/root/testdata/sf0.001").limit(50)
    val out = Raster.rasterTiles(spark, feats, 8)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1) // n_features
      val mask = r.getAs[Array[Byte]](2)
      assert(mask.length == Raster.Px * Raster.Px / 8)
      assert(r.getLong(3) == Raster.popcount(mask))
    }
  }
}
