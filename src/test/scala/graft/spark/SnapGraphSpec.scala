package graft.spark

import org.apache.spark.sql.functions._
import graft.queries.Queries
import graft.ops.TextOps
import graft.core.Fingerprint

/** New analytics ops vs brute-force driver references: nearest-segment
  * snap (map matching), OD-graph PageRank, HLL distinct sketch, bigram
  * counts. The snap test runs at sf0.01 so the mercator high-latitude
  * band (|lat| > 76°, where a fixed 3×3 ring under-covers R and lost 12
  * pairs at sf0.1 before the lat-adaptive ring) is exercised non-vacuously.
  */
class SnapGraphSpec extends SparkTestBase {

  private val sf001 = "/root/testdata/sf0.001"
  private val sf01 = "/root/testdata/sf0.01"

  test("snap_points matches the brute nearest-segment reference (incl. high-lat band)") {
    val R = 2000L
    val roads = (0L until 1000L).map { r =>
      val ax = r * 7919 % 352000 - 176000
      val ay = r * 104729 % 152000 - 76000
      (r, ax, ay, ax + (r * 31 % 81 - 40) * 100, ay + (r * 17 % 81 - 40) * 100)
    }
    val events = spark.read.parquet(s"$sf01/events.parquet")
      .select(col("event_id")).collect().map(_.getLong(0))
    val want = events.flatMap { ev =>
      val px = ev * 7919 % 360000 - 180000
      val py = ev * 104729 % 160000 - 80000
      val cands = roads.flatMap { case (sid, ax, ay, bx, by) =>
        if (px >= math.min(ax, bx) - R && px <= math.max(ax, bx) + R &&
          py >= math.min(ay, by) - R && py <= math.max(ay, by) + R) {
          val dx = bx - ax; val dy = by - ay
          val apx = px - ax; val apy = py - ay
          val dot = dx * apx + dy * apy
          val len2 = dx * dx + dy * dy
          val (d2n, d2d) =
            if (dot <= 0) (apx * apx + apy * apy, 1L)
            else if (dot >= len2) {
              val bpx = px - bx; val bpy = py - by
              (bpx * bpx + bpy * bpy, 1L)
            } else {
              val crs = dx * apy - dy * apx
              (crs * crs, len2)
            }
          val d2 = d2n.toDouble / d2d.toDouble
          if (d2 <= (R * R).toDouble) Some((sid, d2, d2n, d2d)) else None
        } else None
      }
      if (cands.isEmpty) None
      else {
        val best = cands.minBy(c => (c._2, c._1))
        Some((ev, best._1, best._3, best._4))
      }
    }.toSet
    val got = Queries.snapPoints(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // the regression class must be present: matched points above 76° lat
    assert(want.exists { case (ev, _, _, _) => math.abs(ev * 104729 % 160000 - 80000) > 76000 })
    assert(got == want)
  }

  test("cell_pagerank matches the brute integer power iteration") {
    val edges = Queries.odFlows(spark, sf001)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val outW = edges.groupBy(_._1._1).map { case (o, es) => o -> es.values.sum }
    val nodes = (edges.keys.map(_._1) ++ edges.keys.map(_._2)).toSet
    val n = nodes.size.toLong
    val scale = 1000000000000L
    val base = (15L * scale) / (100L * n)
    var rq = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to 3) {
      val in = edges.toSeq.map { case ((o, d), f) => d -> (rq(o) * f) / outW(o) }
        .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      rq = nodes.map(c => c -> (base + (85L * in.getOrElse(c, 0L)) / 100L)).toMap
    }
    val got = Queries.cellPagerank(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rq.nonEmpty && got == rq)
    // rank mass is conserved up to damping leak + integer floors: total is
    // positive and below the scale ceiling (sanity against runaway values)
    assert(got.values.sum > 0 && got.values.sum <= scale)
  }

  test("hll_distinct registers are exact and the estimate lands within 3 sigma") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byLang = docs.groupBy(_._1).map { case (lang, ds) =>
      lang -> ds.flatMap(_._2.split(" ")).toSet
    }
    val want = byLang.map { case (lang, toks) =>
      val regs = Array.fill(64)(0L)
      toks.foreach { t =>
        val h = Fingerprint.fnv1a64(t)
        val b = (h & 63L).toInt
        val w = (h >> 6) & 4294967295L
        val rho = if (w == 0) 33L else 33L - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > regs(b)) regs(b) = rho
      }
      val sq = regs.map(r => 8589934592L >> r).sum
      lang -> (toks.size.toLong, sq)
    }
    val got = TextOps.hllDistinct(spark.read.parquet(s"$sf001/documents.parquet"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == want.keySet && got.nonEmpty)
    want.foreach { case (lang, (nExact, sq)) =>
      val (gn, gs, est) = got(lang)
      assert(gn == nExact && gs == sq, s"registers diverge for $lang")
      // m=64 → relative sigma ≈ 1.04/8 = 13%; 3 sigma bound
      assert(math.abs(est - nExact) / nExact.toDouble < 0.39,
        s"$lang est=$est exact=$nExact")
    }
  }

  test("sssp_khop matches the brute 4-round Bellman-Ford") {
    val edges = Queries.odFlows(spark, sf001)
      .filter(col("o_cell") =!= col("d_cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1), 1L + 1000L / r.getLong(2)))
    val src = edges.map(_._1).min
    var dist = Map(src -> 0L)
    for (_ <- 1 to 4) {
      val relaxed = edges.flatMap { case (o, d, w) => dist.get(o).map(x => d -> (x + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (c, xs) => c -> xs.map(_._2).min }
    }
    val got = Queries.ssspKhop(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dist.size > 1 && got == dist)
  }

  test("triangle_count matches the brute adjacency intersection count") {
    val und = Queries.odFlows(spark, sf001)
      .filter(col("o_cell") =!= col("d_cell"))
      .select(least(col("o_cell"), col("d_cell")).as("u"),
        greatest(col("o_cell"), col("d_cell")).as("v"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (und.map { case (u, v) => u -> v } ++ und.map { case (u, v) => v -> u })
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
    // each triangle counted once per edge and has 3 edges
    val want = und.map { case (u, v) => (adj(u) & adj(v)).size.toLong }.sum / 3
    val got = Queries.triangleCount(spark, sf001).collect()(0).getLong(0)
    assert(want > 0 && got == want)
  }

  test("traj_simplify matches the brute radial-distance walk") {
    val tol2 = 120000L * 120000L
    val evs = spark.read.parquet(s"$sf001/events.parquet")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = evs.groupBy(_._1).toSeq.flatMap { case (u, pts) =>
      var lx, ly = 0L
      var first = true
      pts.sortBy(p => (p._2, p._3)).toSeq.flatMap { case (_, _, ev) =>
        val x = ev * 7919 % 360000 - 180000
        val y = ev * 104729 % 160000 - 80000
        if (first || (x - lx) * (x - lx) + (y - ly) * (y - ly) > tol2) {
          first = false; lx = x; ly = y
          Some((u, ev))
        } else None
      }
    }.toSet
    val got = Queries.trajSimplify(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // both branches of the walk must fire (non-vacuous keep AND drop)
    assert(want.size > evs.length / 4 && want.size < evs.length)
    assert(got == want)
  }

  test("ngram_counts matches the brute bigram top-100") {
    val texts = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
    val counts = texts.flatMap { t =>
      val w = t.split(" ")
      w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }
    }.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val want = counts.toSeq.sortBy { case (ng, c) => (-c, ng) }.take(100).toSet
    val got = TextOps.ngramCounts(spark.read.parquet(s"$sf001/documents.parquet"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got.size == 100 && got == want)
  }
}
