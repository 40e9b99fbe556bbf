package graft.spark

import org.apache.spark.sql.functions._
import graft.queries.Queries
import graft.synth.Synth
import graft.core.CellMath

/** skyline (Pareto front) + zonal_stats vs brute driver references.
  * The brute references use a DIFFERENT algorithm than both the
  * distributed plan (bucket decomposition) and the DuckDB oracle
  * (lex sweep): O(n^2) pairwise dominance for the skyline, and a plain
  * per-feature loop over the z10 cell grid for the zonal aggregation. */
class SkyZonalSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("skyline equals brute O(n^2) pairwise-dominance front") {
    val got = Queries.skyline(spark, sf)
      .select("event_id", "d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // brute reference: recompute (d1,d2) per event on the driver,
    // keep points whose pair is dominated by no other pair
    val pts = Synth.eventPoints(spark, sf).collect().map { r =>
      val id = r.getLong(r.fieldIndex("event_id"))
      val ex = Math.round(r.getDouble(r.fieldIndex("elon")) * 1000)
      val ey = Math.round(r.getDouble(r.fieldIndex("elat")) * 1000)
      val d1 = (ex + 170000L) * (ex + 170000L) + (ey + 75000L) * (ey + 75000L)
      val d2 = (ex - 170000L) * (ex - 170000L) + (ey - 75000L) * (ey - 75000L)
      (id, d1, d2)
    }
    val pairs = pts.map(p => (p._2, p._3)).distinct
    val front = pairs.filter { case (a1, a2) =>
      !pairs.exists { case (b1, b2) =>
        (b1, b2) != (a1, a2) && b1 <= a1 && b2 <= a2
      }
    }.toSet
    val want = pts.filter(p => front.contains((p._2, p._3))).toSet

    assert(got.nonEmpty && got == want,
      s"skyline drifted: got=${got.size} want=${want.size}")
    // sanity: the front is a strict staircase (anti-chain in both dims)
    val f = front.toSeq.sortBy(_._1)
    f.sliding(2).foreach { case Seq((a1, a2), (b1, b2)) =>
      assert(a1 < b1 && a2 > b2, s"not an anti-chain: ($a1,$a2) vs ($b1,$b2)")
    case _ => ()
    }
  }

  test("zonal_stats equals a per-feature driver loop over the z10 grid") {
    val got = Queries.zonalStats(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    val feats = Synth.custFeatures(spark, sf)
      .select("feature_id", "west", "south", "east", "north").collect()
    val want = feats.map { r =>
      val (fid, w, s0, e, n0) = (r.getLong(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val z = 10
      var (cnt, sum, mx) = (0L, 0L, Long.MinValue)
      var x = CellMath.lonToX(z, w)
      val xe = CellMath.lonToX(z, e)
      while (x <= xe) {
        var y = CellMath.latToY(z, n0)
        val ys = CellMath.latToY(z, s0)
        while (y <= ys) {
          val cell = CellMath.pack(z, x, y)
          val (clon, clat) = CellMath.cellCenter(cell)
          if (clon >= w && clon < e && clat >= s0 && clat < n0) {
            val v = cell % 1000L
            cnt += 1; sum += v; mx = math.max(mx, v)
          }
          y += 1
        }
        x += 1
      }
      fid -> ((cnt, sum, mx))
    }.filter(_._2._1 > 0).toMap

    assert(got.nonEmpty && got == want,
      s"zonal drifted: got=${got.size} want=${want.size}")
  }
}
