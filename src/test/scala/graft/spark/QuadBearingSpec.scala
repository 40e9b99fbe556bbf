package graft.spark

import org.apache.spark.sql.functions._
import graft.core.CellMath
import graft.queries.Queries

/** Adaptive quadtree + bearing histogram invariants. */
class QuadBearingSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("quad_tree: leaves partition the event set (cover + disjoint), cap respected") {
    val leaves = Queries.quadTree(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = spark.read.parquet(s"$sf/events.parquet").count()
    // cover: leaf counts sum to the corpus
    assert(leaves.map(_._3).sum == n)
    // cap: every non-forced leaf is under the cap; forced leaves are z8
    leaves.foreach { case (z, _, cnt, forced) =>
      if (forced == 0L) assert(cnt <= 500L) else assert(z == 8L && cnt > 500L)
    }
    // disjoint: no leaf is an ancestor of another
    val set = leaves.map(l => l._2).toSet
    leaves.foreach { case (z, cell, _, _) =>
      (4 until z.toInt).foreach { zp =>
        assert(!set.contains(CellMath.parentCell(cell, zp)), s"leaf $cell has ancestor leaf")
      }
    }
    // every event's z8 cell sits under exactly one leaf
    val byAncestor = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id")).collect().map(_.getLong(0)).forall { id =>
        val lon = ((id * 7919) % 360000) / 1000.0 - 180.0
        val lat = ((id * 104729) % 160000) / 1000.0 - 80.0
        val c8 = CellMath.lonLatToCell(8, lon, lat)
        (4 to 8).count(zp => set.contains(CellMath.parentCell(c8, zp))) == 1
      }
    assert(byAncestor)
  }

  test("geodesic_area: approaches planar area at the equator, shrinks with cos(lat); dwell sums bound the corpus span") {
    val rows = Queries.geodesicArea(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val bounds = graft.synth.Synth.custFeatures(spark, sf)
      .select(col("feature_id"), col("west"), col("south"), col("east"), col("north"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val kmPerDeg = 6371.0088 * math.Pi / 180.0
    rows.foreach { case (fid, a, p) =>
      val (w, s, e, n) = bounds(fid)
      // planar estimate at mid-latitude; spherical exact within 2%
      val mid = (s + n) / 2 * math.Pi / 180.0
      val approx = (e - w) * kmPerDeg * math.cos(mid) * ((n - s) * kmPerDeg)
      assert(a > 0 && math.abs(a - approx) < 0.02 * approx + 1.0, s"feature $fid area $a vs $approx")
      assert(p > 0 && p < 2 * ((e - w) + (n - s)) * kmPerDeg + 1.0)
    }
    // cell_dwell: total dwell == sum over users of (last - first) timestamps
    val evs = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val span = evs.groupBy(_._1).map { case (_, es) => es.map(_._2).max - es.map(_._2).min }.sum
    val dwell = Queries.cellDwell(spark, sf).collect().map(_.getLong(2)).sum
    assert(dwell == span)
  }

  test("tile_render: decoded-pixel stats equal the direct count computation") {
    val evs = spark.read.parquet(s"$sf/events.parquet")
      .select(org.apache.spark.sql.functions.col("event_id")).collect().map(_.getLong(0))
    val counts = evs.groupBy { id =>
      val lon = ((id * 7919) % 360000) / 1000.0 - 180.0
      val lat = ((id * 104729) % 160000) / 1000.0 - 80.0
      CellMath.lonLatToCell(8, lon, lat)
    }.map { case (c, ids) => c -> ids.length.toLong }
    val expect = counts.groupBy { case (c, _) => CellMath.parentCell(c, 4) }
      .map { case (t, m) =>
        t -> (m.values.map(v => math.min(v, 255L)).sum, m.size.toLong)
      }
    val got = graft.ops.Multimodal.tileRender(spark, graft.synth.Synth.eventPoints(spark, sf))
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got == expect)
  }

  test("event_rollup: lattice levels are consistent partial sums of the base level") {
    val rows = Queries.eventRollup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val base = rows.filter(_._1 == 0L)
    val byType = rows.filter(_._1 == 1L).map(r => r._2 -> (r._4, r._5)).toMap
    val total = rows.filter(_._1 == 2L)
    assert(total.length == 1)
    assert(base.map(_._4).sum == total.head._4 && base.map(_._5).sum == total.head._5)
    base.groupBy(_._2).foreach { case (et, rs) =>
      assert(byType(et) == ((rs.map(_._4).sum, rs.map(_._5).sum)), s"etype $et")
    }
  }

  test("bearing_hist: opposite segments land in opposite bins; entropy bounded by ln 8") {
    val rows = Queries.bearingHist(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < 8)
      assert(r.getDouble(4) >= -1e-9 && r.getDouble(4) <= math.log(8.0) + 1e-9)
    }
    // per-district share sums: Σ wq over bins equals each district's total
    val byD = rows.groupBy(_.getLong(0))
    byD.foreach { case (_, rs) => assert(rs.map(_.getLong(3)).sum > 0) }
    // bin formula spot checks: due-east (dy=0, dx>0) is bin 4; due-west wraps to 0
    def bin(dx: Long, dy: Long): Long =
      (math.floor((math.atan2(dy.toDouble, dx.toDouble) + math.Pi) / (2.0 * math.Pi) * 8.0).toLong % 8)
    assert(bin(100, 0) == 4 && bin(-100, 0) == 0 && bin(0, 100) == 6 && bin(0, -100) == 2)
  }
}
