package graft.spark

import graft.queries.Queries
import graft.core.CellMath

/** geary_c / local_moran / kde_grid / std_ellipse vs plain-Scala brute
  * recomputations at sf0.001 — independent of the DuckDB oracle (which
  * proves cross-engine equality; this proves the formulas themselves:
  * the 9-probe neighbor SSD identity, the LISA additivity law
  * Σ I_i = W·moran_i, the 5×5 KDE window vs all 576 nodes, and the
  * ellipse eigenpair vs a direct double covariance decomposition). */
class LocalStatsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Occupied z6 cell -> count, as the queries derive it. */
  private def cellCounts(): Map[Long, Long] =
    graft.synth.Synth.eventPoints(spark, sf).collect()
      .map(r => CellMath.lonLatToCell(6, r.getDouble(1), r.getDouble(2)))
      .groupBy(identity).map { case (c, a) => c -> a.length.toLong }

  private def neighbors(c: Long, occ: Map[Long, Long]): Seq[(Long, Long)] = {
    val (x, y) = (CellMath.xOf(c), CellMath.yOf(c))
    for {
      dx <- -1 to 1; dy <- -1 to 1
      (nx, ny) = (x + dx, y + dy)
      if nx >= 0 && nx < 64 && ny >= 0 && ny < 64
      nc = CellMath.pack(6, nx, ny)
      v <- occ.get(nc)
      if nc != c
    } yield nc -> v
  }

  test("geary_c matches the brute pairwise squared-difference ratio") {
    val occ = cellCounts()
    val n = occ.size.toLong
    val s0 = occ.values.sum
    var (wSum, num, den) = (0L, 0L, 0L)
    occ.foreach { case (c, x) =>
      val nb = neighbors(c, occ)
      wSum += nb.size
      nb.foreach { case (_, xj) => num += (x - xj) * (x - xj) }
      val u = n * x - s0
      den += u * u
    }
    val want = (n - 1).toDouble * n * n * num / (2.0 * wSum * den.toDouble)
    val row = Queries.gearyC(spark, sf).collect()
    assert(row.length == 1)
    val r = row(0)
    assert(r.getLong(0) == n && r.getLong(1) == wSum &&
      r.getLong(2) == num && r.getLong(3) == den,
      s"ints drifted: ${r.mkString(",")} vs ($n,$wSum,$num,$den)")
    assert(num > 0 && den > 0, "vacuous fixture")
    assert(math.abs(r.getDouble(4) - r6(want)) < 1e-9)
  }

  test("local_moran matches brute per-cell LISA and sums to W*moran_i") {
    val occ = cellCounts()
    val n = occ.size.toLong
    val s0 = occ.values.sum
    val u = occ.map { case (c, x) => c -> (n * x - s0) }
    val den = u.values.map(v => v * v).sum
    val got = Queries.localMoran(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getDouble(5))))
      .toMap
    assert(got.keySet == occ.keySet)
    var sumI = 0.0
    occ.foreach { case (c, x) =>
      val ui = u(c)
      val lag = neighbors(c, occ).map { case (nc, _) => u(nc) }.sum
      val (gc, gu, gl, gq, gi) = got(c)
      assert(gc == x && gu == ui && gl == lag, s"cell $c ints drifted")
      val wq =
        if (ui > 0 && lag > 0) "HH" else if (ui < 0 && lag < 0) "LL"
        else if (ui > 0 && lag < 0) "HL" else if (ui < 0 && lag > 0) "LH"
        else "NS"
      assert(gq == wq, s"cell $c quad $gq vs $wq")
      val want = n.toDouble * (ui * lag) / den
      assert(math.abs(gi - r6(want)) < 1e-9, s"cell $c local_i")
      sumI += n.toDouble * (ui * lag) / den
    }
    assert(Set("HH", "LL").subsetOf(got.values.map(_._4).toSet),
      "no cluster cells — fixture too flat to exercise the labels")
    // additivity: Σ I_i = W · moran_i (both from this engine's output)
    val mr = Queries.moranI(spark, sf).collect()(0)
    val wSum = mr.getLong(1)
    assert(math.abs(sumI - wSum * mr.getDouble(4)) <
      math.abs(sumI) * 1e-3 + 1e-3, s"Σ I_i = $sumI vs W*I = ${wSum * mr.getDouble(4)}")
  }

  test("kde_grid matches brute evaluation over all 576 nodes") {
    import spark.implicits._
    val pts = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("(event_id * event_id * 7919 + event_id * 104729) % 360000 - 180000 AS xq",
        "(event_id * event_id * 104729 + event_id * 7919) % 160000 - 80000 AS yq")
      .as[(Long, Long)].collect()
    val h2 = 15000L * 15000L
    val brute = (for (gx <- 0L until 36L; gy <- 0L until 16L) yield {
      val nx = gx * 10000 + 5000 - 180000
      val ny = gy * 10000 + 5000 - 80000
      var (cnt, ws) = (0L, 0L)
      pts.foreach { case (x, y) =>
        val d2 = (x - nx) * (x - nx) + (y - ny) * (y - ny)
        if (d2 <= h2) { cnt += 1; val q = (h2 - d2) / 100000; ws += q * q }
      }
      (gx, gy) -> ((cnt, ws))
    }).filter(_._2._1 > 0).toMap
    val got = Queries.kdeGrid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == brute.keySet,
      s"node sets differ: extra=${got.keySet -- brute.keySet} missing=${brute.keySet -- got.keySet}")
    val n = pts.length.toDouble
    brute.foreach { case (k, (wc, wws)) =>
      val (gc, gws, gk) = got(k)
      assert(gc == wc && gws == wws, s"node $k: ($gc,$gws) vs ($wc,$wws)")
      assert(math.abs(gk - r6(wws / n)) < 1e-9)
    }
    assert(brute.values.exists(_._1 > 5), "vacuous fixture: no dense node")
  }

  test("std_ellipse matches exact moments and a double eigen cross-check") {
    import spark.implicits._
    val pts = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type",
        "((event_id * event_id * 7919 + event_id * 104729) % 360000 - 180000 + 180000) div 100 AS xc",
        "((event_id * event_id * 104729 + event_id * 7919) % 160000 - 80000 + 80000) div 100 AS yc")
      .as[(String, Long, Long)].collect()
    val byType = pts.groupBy(_._1)
    val got = Queries.stdEllipse(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == byType.keySet && got.size >= 3)
    byType.foreach { case (t, a) =>
      val n = a.length.toLong
      val (sx, sy) = (a.map(_._2).sum, a.map(_._3).sum)
      val sxx = a.map(p => p._2 * p._2).sum
      val syy = a.map(p => p._3 * p._3).sum
      val sxy = a.map(p => p._2 * p._3).sum
      val (vxx, vyy, vxy) = (n * sxx - sx * sx, n * syy - sy * sy, n * sxy - sx * sy)
      val r = got(t)
      assert(r.getLong(1) == n && r.getLong(2) == vxx &&
        r.getLong(3) == vyy && r.getLong(4) == vxy, s"type $t moments drifted")
      // independent double covariance eigen decomposition
      val (mx, my) = (sx.toDouble / n, sy.toDouble / n)
      val cxx = a.map(p => (p._2 - mx) * (p._2 - mx)).sum / n
      val cyy = a.map(p => (p._3 - my) * (p._3 - my)).sum / n
      val cxy = a.map(p => (p._2 - mx) * (p._3 - my)).sum / n
      val disc = math.sqrt((cxx - cyy) * (cxx - cyy) + 4 * cxy * cxy)
      val (lMaj, lMin) = ((cxx + cyy + disc) / 2, (cxx + cyy - disc) / 2)
      val sMaj = math.sqrt(math.max(lMaj, 0))
      val sMin = math.sqrt(math.max(lMin, 0))
      assert(math.abs(r.getDouble(7)) <= 90.000001, s"type $t theta out of range")
      assert(math.abs(r.getAs[Double]("sigma_major") - sMaj) < 1e-3 * sMaj + 1e-6,
        s"type $t sigma_major ${r.getAs[Double]("sigma_major")} vs $sMaj")
      assert(math.abs(r.getAs[Double]("sigma_minor") - sMin) < 1e-3 * sMaj + 1e-6,
        s"type $t sigma_minor")
      assert(r.getAs[Double]("sigma_major") >= r.getAs[Double]("sigma_minor"))
      assert(r.getAs[Double]("sigma_minor") > 0, s"type $t degenerate")
      assert(math.abs(r.getAs[Double]("mean_x") - r6(mx)) < 1e-9)
      assert(math.abs(r.getAs[Double]("mean_y") - r6(my)) < 1e-9)
    }
  }
}
