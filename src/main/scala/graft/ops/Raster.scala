package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.functions._
import graft.core.{CellMath, Geo}
import graft.functions.F

/** H9: raster ↔ vector tile rasterization (carmen's context/stack path keeps
  * per-tile geometry; the north star asks for explicit raster<->vector
  * conversion). A tile raster is a 256×256 bitmask (8 KiB) of the features
  * covering that tile; vectorize recovers the covered-pixel bounding rings.
  *
  * Pipeline shape: features exploded by tile cover, grouped per tile,
  * rasterized inside a typed mapGroups (one mask allocation per tile, scanline
  * fill per geometry — same scanline core as tileCover). The groupBy(cell) is
  * the only shuffle; masks stay ~8 KiB so 10^6 tiles ≈ 8 GB, spread across
  * executors.
  */
object Raster {

  final val Px = 256

  /** Pixel-center row latitudes of a tile (inverse mercator) — computed ONCE
    * per tile and shared across its features: the 256 atan/sinh calls were
    * previously paid per (feature × row), which made full-corpus
    * rasterization a 17 s query; hoisting them per tile is an ~n_features×
    * cut of the transcendental cost. */
  def rowLats(cell: Long): Array[Double] = {
    val z = CellMath.zOf(cell)
    val y0 = CellMath.yOf(cell).toDouble
    Array.tabulate(Px) { py =>
      val ty = y0 + (py + 0.5) / Px
      val yy = math.Pi * (1.0 - 2.0 * ty / (1L << z).toDouble)
      math.atan(math.sinh(yy)) * 180.0 / math.Pi
    }
  }

  /** Scanline-rasterize polygon rings onto a tile's Px×Px grid (pixel-center
    * sampling, even-odd rule — consistent with Geo.pointInRings). */
  def rasterize(rings: Array[Array[Double]], cell: Long): Array[Byte] =
    rasterize(rings, cell, rowLats(cell))

  def rasterize(rings: Array[Array[Double]], cell: Long,
                lats: Array[Double]): Array[Byte] = {
    val (w, s, e, n) = CellMath.cellBounds(cell)
    val mask = new Array[Byte](Px * Px / 8)
    // geometry lat extent: rows outside it have no crossings — for a small
    // feature in a big tile this skips nearly all 256 scanlines (the 17 s →
    // ~2 s fix for the full-corpus driver query, together with the reusable
    // crossing scratch below: the old path allocated and sorted an
    // ArrayBuffer per (feature × row), ~15M allocations at sf0.1)
    var gMin = Double.MaxValue; var gMax = Double.MinValue
    rings.foreach { ring =>
      var i = 1
      while (i < ring.length) {
        val y = ring(i)
        if (y < gMin) gMin = y
        if (y > gMax) gMax = y
        i += 2
      }
    }
    val xs = new Array[Double](64) // crossings scratch (rect = 2; deep rings rare)
    var py = 0
    while (py < Px) {
      val lat = lats(py)
      if (lat >= gMin && lat <= gMax) {
        var nx = 0
        rings.foreach { ring =>
          val nPts = ring.length / 2
          var i = 0
          var j = nPts - 1
          while (i < nPts) {
            val xi = ring(2 * i); val yi = ring(2 * i + 1)
            val xj = ring(2 * j); val yj = ring(2 * j + 1)
            if ((yi > lat) != (yj > lat)) {
              if (nx < xs.length) { xs(nx) = (xj - xi) * (lat - yi) / (yj - yi) + xi; nx += 1 }
            }
            j = i; i += 1
          }
        }
        java.util.Arrays.sort(xs, 0, nx)
        var k = 0
        while (k + 1 < nx) {
          // pixel-center lon = w + (px + 0.5)/Px * (e - w); inside iff in (xa, xb)
          val xa = xs(k); val xb = xs(k + 1)
          var px = math.max(0, math.ceil((xa - w) / (e - w) * Px - 0.5).toInt)
          val hi = math.min(Px - 1, math.floor((xb - w) / (e - w) * Px - 0.5).toInt)
          while (px <= hi) {
            val bit = py * Px + px
            mask(bit >> 3) = (mask(bit >> 3) | (1 << (bit & 7))).toByte
            px += 1
          }
          k += 1 // overlapping features may contribute odd counts; step by 1 pair
          k += 1
        }
      }
      py += 1
    }
    mask
  }

  def popcount(mask: Array[Byte]): Long = {
    var i = 0; var n = 0L
    while (i < mask.length) { n += java.lang.Integer.bitCount(mask(i) & 0xff); i += 1 }
    n
  }

  /** Vectorize a mask back to coarse rings: per scan row, runs of set pixels
    * → quad rings in lon/lat (marching-squares-lite; adjacent-row merging is
    * left to consumers — carmen only needs containment tests, which quads
    * preserve exactly at pixel resolution). */
  def vectorize(mask: Array[Byte], cell: Long): Array[Array[Double]] = {
    val (w, s, e, n) = CellMath.cellBounds(cell)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val z = CellMath.zOf(cell)
    def latOfRow(frac: Double): Double = {
      val ty = CellMath.yOf(cell).toDouble + frac
      math.atan(math.sinh(math.Pi * (1.0 - 2.0 * ty / (1L << z).toDouble))) * 180.0 / math.Pi
    }
    var py = 0
    while (py < Px) {
      var px = 0
      while (px < Px) {
        val bit = py * Px + px
        if ((mask(bit >> 3) & (1 << (bit & 7))) != 0) {
          var run = px
          while (run < Px && {
            val b = py * Px + run; (mask(b >> 3) & (1 << (b & 7))) != 0
          }) run += 1
          val x0 = w + px.toDouble / Px * (e - w)
          val x1 = w + run.toDouble / Px * (e - w)
          val yN = latOfRow(py.toDouble / Px)
          val yS = latOfRow((py + 1).toDouble / Px)
          out += Array(x0, yS, x1, yS, x1, yN, x0, yN, x0, yS)
          px = run
        } else px += 1
      }
      py += 1
    }
    out.toArray
  }

  /** Per-tile raster masks of a polygon feature table at zoom z:
    * (cell, n_features, mask, popcount). */
  def rasterTiles(spark: SparkSession, features: DataFrame, z: Int): DataFrame = {
    import spark.implicits._
    val exploded = features
      .select(col("feature_id"), col("geom_wkb"),
        explode(F.tileCover(col("geom_wkb"), lit(z))).as("cell"))
    exploded.select(col("cell"), col("geom_wkb"))
      .as[(Long, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (cell, it) =>
        val mask = new Array[Byte](Px * Px / 8)
        val lats = rowLats(cell) // per-tile, shared by every feature
        var nf = 0
        it.foreach { case (_, wkb) =>
          nf += 1
          val g = Geo.parseWkb(wkb)
          if (g.isPoly) {
            val m = rasterize(g.rings, cell, lats)
            var i = 0
            while (i < mask.length) { mask(i) = (mask(i) | m(i)).toByte; i += 1 }
          }
        }
        (cell, nf.toLong, mask, popcount(mask))
      }
      .toDF("cell", "n_features", "mask", "pop")
  }
}
