package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property-style tests with a fixed seed (scalatestplus bridge not in the
  * offline cache, so forAll loops are hand-rolled and deterministic). */
class CellMathSpec extends AnyFunSuite {
  import CellMath._

  private def rnd = new Random(42)

  test("pack/unpack roundtrip") {
    val r = rnd
    for (_ <- 1 to 2000) {
      val z = r.nextInt(17)
      val max = (1L << z) - 1
      val x = if (max == 0) 0L else math.abs(r.nextLong()) & max
      val y = if (max == 0) 0L else math.abs(r.nextLong()) & max
      val c = pack(z, x, y)
      assert(zOf(c) == z && xOf(c) == x && yOf(c) == y)
    }
  }

  test("cell bounds contain the point that mapped to the cell") {
    val r = rnd
    for (_ <- 1 to 2000) {
      val z = 1 + r.nextInt(16)
      val lon = r.nextDouble() * 359.8 - 179.9
      val lat = r.nextDouble() * 169.8 - 84.9
      val c = lonLatToCell(z, lon, lat)
      val (w, s, e, n) = cellBounds(c)
      assert(lon >= w - 1e-9 && lon <= e + 1e-9, s"lon $lon not in [$w,$e] z=$z")
      assert(lat >= s - 1e-7 && lat <= n + 1e-7, s"lat $lat not in [$s,$n] z=$z")
    }
  }

  test("known tiles: z0 single tile; z1 quadrants; z14 greenwich corner") {
    assert(lonLatToCell(0, 0.0, 0.0) == pack(0, 0, 0))
    assert(xOf(lonLatToCell(1, -90.0, 40.0)) == 0)
    assert(yOf(lonLatToCell(1, -90.0, 40.0)) == 0)
    assert(xOf(lonLatToCell(1, 90.0, -40.0)) == 1)
    assert(yOf(lonLatToCell(1, 90.0, -40.0)) == 1)
    val c = lonLatToCell(14, 0.0001, -0.0001)
    assert(xOf(c) == 8192 && yOf(c) == 8192)
  }

  test("parentCell of children is identity; matches direct computation") {
    val r = rnd
    for (_ <- 1 to 2000) {
      val z = r.nextInt(15)
      val lon = r.nextDouble() * 359.8 - 179.9
      val lat = r.nextDouble() * 169.8 - 84.9
      val c = lonLatToCell(z, lon, lat)
      childrenCells(c).foreach(ch => assert(parentCell(ch, z) == c))
      if (z >= 2) assert(parentCell(c, z - 2) == lonLatToCell(z - 2, lon, lat))
    }
  }

  test("ringCells: exactly Chebyshev r, distinct, complete in interior") {
    val r = rnd
    for (_ <- 1 to 1000) {
      val z = 4 + r.nextInt(11)
      val rad = r.nextInt(4)
      val lon = r.nextDouble() * 359.8 - 179.9
      val lat = r.nextDouble() * 169.8 - 84.9
      val c = lonLatToCell(z, lon, lat)
      val ring = ringCells(c, rad)
      assert(ring.distinct.length == ring.length)
      ring.foreach { rc =>
        val d = math.max(math.abs(xOf(rc) - xOf(c)), math.abs(yOf(rc) - yOf(c)))
        assert(d == rad)
      }
      val max = (1L << z) - 1
      if (xOf(c) >= rad && xOf(c) + rad <= max && yOf(c) >= rad && yOf(c) + rad <= max)
        assert(ring.length == (if (rad == 0) 1 else 8 * rad))
    }
  }

  test("diskCells covers rings 0..r") {
    val c = lonLatToCell(10, 12.3, 45.6)
    assert(diskCells(c, 2).length == 1 + 8 + 16)
  }

  test("annulusCells == diskCells(rOut) minus diskCells(rIn), incl. clamped edges") {
    val r = rnd
    for (_ <- 1 to 500) {
      val z = 2 + r.nextInt(13)
      val rOut = 1 + r.nextInt(8)
      val rIn = -1 + r.nextInt(rOut + 1) // -1 .. rOut-1
      val lon = r.nextDouble() * 359.8 - 179.9
      val lat = r.nextDouble() * 169.8 - 84.9
      val c = lonLatToCell(z, lon, lat)
      val ann = annulusCells(c, rIn, rOut)
      val expected = diskCells(c, rOut).toSet --
        (if (rIn < 0) Set.empty[Long] else diskCells(c, rIn).toSet)
      assert(ann.toSet == expected)
      assert(ann.distinct.length == ann.length)
      // rIn = -1 degenerates to the disk, element order included
      if (rIn == -1) assert(ann.sameElements(diskCells(c, rOut)))
    }
  }

  test("hilbert is a bijection on [0, 4^z) with unit steps") {
    val z = 5
    val n = 1L << z
    val seen = new java.util.HashSet[Long]()
    for (x <- 0L until n; y <- 0L until n) {
      val d = hilbert(z, x, y)
      assert(d >= 0 && d < n * n)
      assert(seen.add(d), s"duplicate hilbert d=$d at ($x,$y)")
      val (xi, yi) = hilbertInv(z, d)
      assert(xi == x && yi == y)
    }
    var prev = hilbertInv(z, 0)
    for (d <- 1L until n * n) {
      val cur = hilbertInv(z, d)
      assert(math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2) == 1)
      prev = cur
    }
  }

  test("bboxToHilbertRanges: exact small boxes; coarse fallback is a sound over-approximation") {
    // exact path: every tile of the box maps into some range
    val (w, s, e, n) = (-30.0, -20.0, 40.0, 35.0)
    val z = 8
    val r = bboxToHilbertRanges(w, s, e, n, z)
    val x0 = lonToX(z, w); val x1 = lonToX(z, e)
    val y0 = latToY(z, n); val y1 = latToY(z, s)
    for (x <- x0 to x1; y <- y0 to y1) {
      val h = hilbert(z, x, y)
      assert(r.exists { case (lo, hi) => h >= lo && h <= hi }, s"($x,$y) uncovered")
    }
    // fallback path: a world box at z16 (4.3e9 tiles) must not overflow and
    // must still cover sampled in-box tiles; ranges stay sorted and bounded
    val big = bboxToHilbertRanges(-179.9, -80.0, 179.9, 80.0, 16)
    assert(big.nonEmpty)
    assert(big.forall { case (lo, hi) => lo <= hi && lo >= 0 && hi < (1L << 32) })
    val samples = Seq((-120.0, 40.0), (0.0, 0.0), (150.0, -60.0), (10.0, 75.0))
    samples.foreach { case (lon, lat) =>
      val h = hilbert(16, lonToX(16, lon), latToY(16, lat))
      assert(big.exists { case (lo, hi) => h >= lo && h <= hi }, s"($lon,$lat) uncovered")
    }
  }
}
