package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}

/** Convex-hull kernel tests. JTS is the test oracle (never in main code).
  * JTS ConvexHull KEEPS collinear boundary points in some versions and
  * drops them in others, so the comparison is on the vertex SET after
  * filtering to extreme points via exact cross products.
  */
class HullSpec extends AnyFunSuite {
  import Geo.convexHull

  private val gf = new GeometryFactory()

  private def cross(o: (Long, Long), a: (Long, Long), b: (Long, Long)): Long =
    (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)

  /** Extreme points of a CONVEX ring given in order (drops collinear
    * mid-edge vertices) — normalizes JTS output for set comparison. */
  private def extremeOfRing(ring: Array[(Long, Long)]): Set[(Long, Long)] = {
    val n = ring.length
    if (n <= 2) return ring.toSet
    ring.indices.filter { i =>
      cross(ring((i + n - 1) % n), ring(i), ring((i + 1) % n)) != 0
    }.map(ring).toSet
  }

  private def jtsHullSet(pts: Array[(Long, Long)]): Set[(Long, Long)] = {
    val coords = pts.map { case (x, y) => new Coordinate(x.toDouble, y.toDouble) }
    val hull = new org.locationtech.jts.algorithm.ConvexHull(coords, gf).getConvexHull
    hull.getGeometryType match {
      case "Point" => Set((hull.getCoordinate.x.toLong, hull.getCoordinate.y.toLong))
      case "LineString" =>
        hull.getCoordinates.map(c => (c.x.toLong, c.y.toLong)).toSet
      case _ =>
        val ring = hull.getCoordinates.dropRight(1).map(c => (c.x.toLong, c.y.toLong))
        extremeOfRing(ring)
    }
  }

  test("hull matches JTS extreme-point set on random lattice clouds") {
    val r = new Random(42)
    for (trial <- 0 until 300) {
      val n = 1 + r.nextInt(60)
      // small lattice ranges force duplicates and collinear runs
      val range = if (trial % 3 == 0) 8L else 4000L
      val pts = Array.fill(n)((r.nextLong(range), r.nextLong(range)))
      val ours = convexHull(pts).toSet
      val jts = jtsHullSet(pts)
      assert(ours == jts, s"trial $trial: ours=$ours jts=$jts pts=${pts.toSeq}")
    }
  }

  test("degenerate inputs: point, duplicate point, collinear run") {
    assert(convexHull(Array((5L, 5L))).toSeq == Seq((5L, 5L)))
    assert(convexHull(Array((5L, 5L), (5L, 5L))).toSeq == Seq((5L, 5L)))
    assert(convexHull(Array((0L, 0L), (2L, 2L), (1L, 1L), (3L, 3L))).toSet ==
      Set((0L, 0L), (3L, 3L)))
    assert(convexHull(Array((0L, 0L), (4L, 0L), (2L, 0L), (2L, 3L))).toSet ==
      Set((0L, 0L), (4L, 0L), (2L, 3L)))
  }

  test("output is CCW from the lexicographic minimum") {
    val pts = Array((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L), (5L, 5L))
    val h = convexHull(pts)
    assert(h.head == ((0L, 0L)))
    // CCW: every consecutive triple turns strictly left
    val n = h.length
    for (i <- 0 until n)
      assert(cross(h(i), h((i + 1) % n), h((i + 2) % n)) > 0)
  }

  test("hull-of-hulls equals single-pass hull on 50k points (the distributed merge)") {
    val r = new Random(7)
    val pts = Array.fill(50000)((r.nextLong(360000), r.nextLong(160000)))
    val direct = convexHull(pts).toSet
    val buckets = pts.groupBy { case (x, y) => ((x * 31 + y) % 64).toInt }
    val merged = convexHull(buckets.values.flatMap(convexHull(_)).toArray).toSet
    assert(merged == direct)
    // and the partial level genuinely shrinks the shuffle payload
    assert(buckets.values.map(convexHull(_).length).sum < 64 * 40)
  }
}
