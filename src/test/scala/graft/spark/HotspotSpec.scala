package graft.spark

import graft.queries.Queries
import graft.synth.Synth
import graft.core.CellMath

/** geohash / gi_star / mk_trend vs independent driver references:
  * classic bisection geohash (different algorithm than the interleave
  * formula), plain-Scala Gi* and Mann–Kendall recomputations. Integer
  * outputs compare exactly; the z doubles compare to 1e-9 after the
  * same round-to-6 (the driver reference does not reproduce Spark's
  * operation order bit-for-bit — the ORACLE mirror is the bit-exact
  * gate). */
class HotspotSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def ghRef(lon: Double, lat: Double, chars: Int): String = {
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    var (lo1, hi1) = (-180.0, 180.0)
    var (lo2, hi2) = (-90.0, 90.0)
    var even = true; var bit = 0; var ch = 0
    val sb = new StringBuilder
    while (sb.length < chars) {
      if (even) {
        val mid = (lo1 + hi1) / 2
        if (lon >= mid) { ch = ch * 2 + 1; lo1 = mid } else { ch = ch * 2; hi1 = mid }
      } else {
        val mid = (lo2 + hi2) / 2
        if (lat >= mid) { ch = ch * 2 + 1; lo2 = mid } else { ch = ch * 2; hi2 = mid }
      }
      even = !even; bit += 1
      if (bit == 5) { sb.append(alpha(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  test("geohash matches bisection reference and the published test vector") {
    // Wikipedia's canonical example: (57.64911 N, 10.40744 E) -> u4pruydqqvj
    assert(ghRef(10.40744, 57.64911, 8) == "u4pruydq")
    val rows = Synth.eventPoints(spark, sf).collect()
    val want = rows.map { r =>
      r.getLong(0) -> ghRef(r.getDouble(1), r.getDouble(2), 8)
    }.toMap
    val got = Queries.geohash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == want.size && got == want)
  }

  test("gi_star matches a plain-Scala recomputation") {
    val cnt = Synth.eventPoints(spark, sf).collect()
      .map(r => CellMath.lonLatToCell(6, r.getDouble(1), r.getDouble(2)))
      .groupBy(identity).map { case (c, a) => c -> a.length.toLong }
    val n = cnt.size.toLong
    val sumc = cnt.values.sum
    val sumc2 = cnt.values.map(v => v * v).sum
    val mean = sumc.toDouble / n
    val s2 = sumc2.toDouble / n - mean * mean
    val want = cnt.map { case (c, _) =>
      val (x, y) = (CellMath.xOf(c), CellMath.yOf(c))
      var (sm, wn) = (0L, 0L)
      for (dx <- -1 to 1; dy <- -1 to 1) {
        val (nx, ny) = (x + dx, y + dy)
        if (nx >= 0 && nx < 64 && ny >= 0 && ny < 64) {
          cnt.get(CellMath.pack(6, nx, ny)).foreach { v => sm += v; wn += 1 }
        }
      }
      val z =
        if (n <= 1 || wn * (n - wn) <= 0 || s2 <= 0) 0.0
        else (sm - mean * wn) /
          (math.sqrt(s2) * math.sqrt((n.toDouble * wn - wn.toDouble * wn) / (n - 1.0)))
      c -> ((cnt(c), sm, wn, z))
    }
    val got = Queries.giStar(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got.size == want.size)
    want.foreach { case (c, (wc, wsm, wwn, wz)) =>
      val (gc, gsm, gwn, gz) = got(c)
      assert(gc == wc && gsm == wsm && gwn == wwn, s"cell $c ints drifted")
      assert(math.abs(gz - r6(wz)) < 1e-9, s"cell $c z: $gz vs $wz")
    }
  }

  test("mk_trend matches a plain-Scala Mann-Kendall recomputation") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .as[(Long, Long)].collect()
    val pts = Synth.eventPoints(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val mn = ev.map(_._2).min
    val mx = ev.map(_._2).max
    val byCell = ev.groupBy { case (id, _) =>
      val (lo, la) = pts(id); CellMath.lonLatToCell(5, lo, la)
    }
    val want = byCell.map { case (c, rows) =>
      val arr = Array.fill(8)(0L)
      rows.foreach { case (_, us) =>
        arr((((us - mn) * 8) / (mx - mn + 1)).toInt) += 1
      }
      var s = 0L
      for (j <- 1 until 8; i <- 0 until j) s += java.lang.Long.signum(arr(j) - arr(i))
      val tn = arr.map(v => arr.count(_ == v).toLong)
        .map(t => (t - 1) * (2 * t + 5)).sum
      val varNum = 1176 - tn
      val z =
        if (varNum <= 0 || s == 0) 0.0
        else (s + (if (s > 0) -1 else 1)) / math.sqrt(varNum.toDouble / 18.0)
      c -> ((rows.length.toLong, s, varNum, z))
    }
    val got = Queries.mkTrend(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got.size == want.size)
    want.foreach { case (c, (wn, ws, wv, wz)) =>
      val (gn, gs, gv, gz) = got(c)
      assert(gn == wn && gs == ws && gv == wv, s"cell $c ints drifted")
      assert(math.abs(gz - r6(wz)) < 1e-9, s"cell $c z: $gz vs $wz")
    }
    // the fixture must actually exercise a nonzero trend somewhere
    assert(want.values.exists(_._2 != 0L), "all-zero S: trend vacuous")
  }
}
