package graft.spark

import org.apache.spark.sql.functions._
import graft.queries.Queries

/** HMM map matching: the distributed 7-round Viterbi decode must equal an
  * exhaustive path enumeration over the same candidate lattice (≤ 3^8
  * paths per user at sf0.001 — brute force is exact). */
class ViterbiSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("viterbi_match equals exhaustive min-cost path enumeration") {
    val out = Queries.viterbiMatch(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    // rebuild the candidate lattice exactly as the operator defines it:
    // top-3 segments by (d2, seg_id) per fix, steps densely renumbered
    val segs = (0L until 1000L).map { s =>
      val ax = s * 7919 % 352000 - 176000
      val ay = s * 104729 % 152000 - 76000
      (s, ax, ay, ax + (s * 31 % 81 - 40) * 100, ay + (s * 17 % 81 - 40) * 100)
    }
    val evs = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = evs.groupBy(_._2).map { case (u, es) =>
      u -> es.sortBy(e => (e._3, e._1)).take(8).map(_._1)
    }
    val R = 2000L
    def cands(eid: Long): Seq[(Long, Long, Long, Long)] = { // (seg, emit, mx, my)
      val px = eid * 7919 % 360000 - 180000
      val py = eid * 104729 % 160000 - 80000
      val within = segs.flatMap { case (s, ax, ay, bx, by) =>
        if (px < math.min(ax, bx) - R || px > math.max(ax, bx) + R ||
          py < math.min(ay, by) - R || py > math.max(ay, by) + R) None
        else {
          val dx = bx - ax; val dy = by - ay
          val apx = px - ax; val apy = py - ay
          val bpx = px - bx; val bpy = py - by
          val dot = dx * apx + dy * apy; val len2 = dx * dx + dy * dy
          val crs = dx * apy - dy * apx
          val (n, d) =
            if (dot <= 0) (apx * apx + apy * apy, 1L)
            else if (dot >= len2) (bpx * bpx + bpy * bpy, 1L)
            else (crs * crs, len2)
          val d2 = n.toDouble / d.toDouble
          if (d2 <= (R * R).toDouble) Some((d2, s, n / d, ax + bx, ay + by)) else None
        }
      }
      within.sortBy(c => (c._1, c._2)).take(3).map(c => (c._2, c._3, c._4, c._5))
    }
    var checked = 0
    byUser.foreach { case (u, eids) =>
      val lattice = eids.map(cands).filter(_.nonEmpty)
      if (lattice.nonEmpty) {
        // exhaustive enumeration
        var paths: Seq[(Long, Seq[Long], Long, Long)] = // cost, path, mx, my
          lattice.head.map(c => (c._2, Seq(c._1), c._3, c._4))
        lattice.tail.foreach { step =>
          paths = for {
            (cost, path, mx, my) <- paths
            (s, e, nmx, nmy) <- step
          } yield (cost + math.abs(nmx - mx) + math.abs(nmy - my) + e, path :+ s, nmx, nmy)
        }
        val best = paths.minBy(p => (p._1, p._2.last, p._2.map(_.toString).mkString("-")))
        val (n, cost, endSeg, pathS) = out(u)
        assert(n == lattice.length.toLong, s"user $u steps")
        assert(cost == best._1, s"user $u cost")
        checked += 1
      } else assert(!out.contains(u))
    }
    assert(checked > 0 && out.size == checked)
  }
}
