package graft.spark

import graft.queries.Queries

/** stay_points / hits_rank / crawl_frontier vs independent plain-Scala
  * recomputations (the DuckDB oracle mirror is the bit-exact gate;
  * these pin semantics against a second implementation). */
class GraphFrontierSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("stay_points matches a plain-Scala anchor-reset walk") {
    import spark.implicits._
    val d2 = 100000L * 100000L
    val tUs = 36000000000L
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .as[(Long, Long, Long)].collect()
    val want = ev.groupBy(_._2).toSeq.flatMap { case (u, rows) =>
      val pts = rows.sortBy(r => (r._3, r._1)).map { case (id, _, us) =>
        (us,
          (id * id * 7919 + id * 104729) % 360000 - 180000,
          (id * id * 104729 + id * 7919) % 160000 - 80000)
      }
      val out = collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long)]
      var (ax, ay, at) = (pts.head._2, pts.head._3, pts.head._1)
      var (lt, n, sx, sy) = (pts.head._1, 1L, pts.head._2 + 180000, pts.head._3 + 80000)
      def close(): Unit =
        if (lt - at >= tUs)
          out += ((u, at, lt, n, sx / n - 180000, sy / n - 80000))
      pts.tail.foreach { case (us, x, y) =>
        if ((x - ax) * (x - ax) + (y - ay) * (y - ay) <= d2) {
          lt = us; n += 1; sx += x + 180000; sy += y + 80000
        } else {
          close()
          ax = x; ay = y; at = us; lt = us; n = 1; sx = x + 180000; sy = y + 80000
        }
      }
      close()
      out
    }.toSet
    val got = Queries.stayPoints(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    assert(got.nonEmpty && got.exists(_._4 >= 3), "no multi-point stay: fixture weak")
  }

  test("dp_simplify matches a genuinely recursive Scala Douglas-Peucker") {
    import spark.implicits._
    val tol2 = 120000L * 120000L
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .as[(Long, Long, Long)].collect()
    val want = ev.groupBy(_._2).toSeq.flatMap { case (u, rows) =>
      val pts = rows.sortBy(r => (r._3, r._1)).map { case (id, _, _) =>
        (id,
          (id * id * 7919 + id * 104729) % 360000 - 180000,
          (id * id * 104729 + id * 7919) % 160000 - 80000)
      }
      val kept = collection.mutable.Set.empty[Int]
      def rec(i: Int, j: Int): Unit = {
        kept += i; kept += j
        if (j - i < 2) return
        val (ax, ay) = (pts(i)._2, pts(i)._3)
        val (bx, by) = (pts(j)._2, pts(j)._3)
        val len2 = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
        var (best, bk) = (-1, -1.0)
        for (p <- i + 1 until j) {
          val (x, y) = (pts(p)._2, pts(p)._3)
          val k =
            if (len2 == 0) ((x - ax) * (x - ax) + (y - ay) * (y - ay)).toDouble
            else {
              val cr = (bx - ax) * (y - ay) - (by - ay) * (x - ax)
              cr.toDouble * cr.toDouble / len2.toDouble
            }
          if (k > bk) { bk = k; best = p } // strict > == smallest-rn tiebreak
        }
        if (bk > tol2.toDouble) { rec(i, best); rec(best, j) }
      }
      rec(0, pts.length - 1)
      kept.toSeq.map(k => (u, pts(k)._1))
    }.toSet
    val got = Queries.dpSimplify(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    // real simplification AND real splits (both recursion branches live)
    assert(got.size > 2L * ev.map(_._2).distinct.length && got.size < ev.length,
      s"degenerate DP: kept ${got.size} of ${ev.length}")
  }

  test("hits_rank matches a plain-Scala integer HITS iteration") {
    import spark.implicits._
    val scale = 1000000L
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id").as[Long].collect()
    val edges = docs.flatMap { d =>
      (1 to 3).map(j => (s"h${d % 97}.example.org", s"h${(d * 31 + j * 17) % 97}.example.org"))
    }.groupBy(identity).map { case ((s0, t), a) => (s0, t, a.length.toLong) }.toSeq
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    var hub = nodes.map(_ -> scale / n).toMap
    var auth = Map.empty[String, Long]
    for (_ <- 1 to 3) {
      val araw = edges.groupBy(_._2).map { case (t, es) =>
        t -> es.map(e => hub(e._1) * e._3).sum
      }
      val at = araw.values.sum
      auth = nodes.map(h => h -> araw.getOrElse(h, 0L) * scale / at).toMap
      val hraw = edges.groupBy(_._1).map { case (s0, es) =>
        s0 -> es.map(e => auth(e._2) * e._3).sum
      }
      val ht = hraw.values.sum
      hub = nodes.map(h => h -> hraw.getOrElse(h, 0L) * scale / ht).toMap
    }
    val got = Queries.hitsRank(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size == n)
    nodes.foreach { h =>
      assert(got(h) == ((auth(h), hub(h))), s"host $h drifted")
    }
    assert(auth.values.toSet.size > 1 && hub.values.toSet.size > 1, "flat scores")
  }

  test("anchor_text matches a seed-arithmetic recomputation") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").as[(Long, String)].collect()
    val want = docs.flatMap { case (d, text) =>
      val words = text.split(" ")
      (1 to 3).map(j =>
        (s"h${(d * 31 + j * 17) % 97}.example.org", words(((d + j) % 5).toInt)))
    }.groupBy(p => p).map { case ((h, l), a) => (h, l, a.size.toLong) }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.toSeq.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
          .map { case ((h, l, n), i) => (h, l, n, (i + 1).toLong) }
      }.toSet
    val got = Queries.anchorText(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    assert(got.map(_._2).size > 3, "label variety vacuous")
  }

  test("user_entropy matches a quantized-term recomputation") {
    import spark.implicits._
    import graft.core.CellMath
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "user_id").as[(Long, Long)].collect()
    val want = ev.groupBy(_._2).map { case (u, rows) =>
      val byCell = rows.groupBy { case (id, _) => CellMath.lonLatToCell(6,
        (id * 7919 % 360000) / 1000.0 - 180.0, (id * 104729 % 160000) / 1000.0 - 80.0)
      }.map { case (_, a) => a.length.toLong }
      val n = byCell.sum
      val ent = byCell.map { v =>
        val p = v.toDouble / n
        BigDecimal(-p * math.log(p) * 1000000000.0)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum
      u -> ((n, byCell.size.toLong, ent))
    }
    val got = Queries.userEntropy(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
    assert(got.values.exists(_._3 > 0), "all-zero entropy: vacuous")
  }

  test("cohort_retention matches a first-week-cohort recomputation") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .as[(Long, Long)].collect()
    val mn = ev.map(_._2).min; val mx = ev.map(_._2).max
    val uw = ev.filter { case (u, us) => us >= mn + (u % 4) * ((mx - mn + 1) / 4) }
      .map { case (u, us) => (u, us / 604800000000L) }.distinct
    val cohort = uw.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val want = uw.map { case (u, w) => (cohort(u), w) }
      .groupBy(p => p).map { case ((c, w), a) => (c, w, a.size.toLong) }.toSet
    val got = Queries.cohortRetention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.map(_._1).size >= 3, "fewer than 3 cohorts: stagger vacuous")
  }

  test("home_cell matches a modal-night-cell recomputation") {
    import spark.implicits._
    import graft.core.CellMath
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .as[(Long, Long, Long)].collect()
    val want = ev.filter(e => (e._3 / 3600000000L) % 24 < 6)
      .groupBy(_._2).map { case (u, rows) =>
        val byCell = rows.groupBy { case (id, _, _) => CellMath.lonLatToCell(6,
          (id * 7919 % 360000) / 1000.0 - 180.0, (id * 104729 % 160000) / 1000.0 - 80.0)
        }.map { case (c, a) => (c, a.length.toLong) }
        val (c, n) = byCell.toSeq.minBy { case (c0, n0) => (-n0, c0) }
        u -> ((c, n))
      }
    val got = Queries.homeCell(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    assert(got.nonEmpty, "no night fixes: fixture vacuous")
  }

  test("host_sim matches an exact set-Jaccard recomputation") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").as[(Long, String)].collect()
    val sets = docs.groupBy(_._1 % 97).map { case (h, ds) =>
      s"h$h.example.org" -> ds.flatMap(_._2.split(" ")).toSet
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hosts = sets.keys.toSeq.sorted
    val want = (for {
      i <- hosts.indices; j <- i + 1 until hosts.length
    } yield {
      val (a, b) = (hosts(i), hosts(j))
      val inter = (sets(a) & sets(b)).size.toLong
      val uni = sets(a).size + sets(b).size - inter
      (a, b, inter, uni, inter.toDouble / uni)
    }).sortBy(r => (-r._5, r._1, r._2)).take(20).zipWithIndex
      .map { case ((a, b, i2, u, j), k) => (a, b, i2, u, r6(j), (k + 1).toLong) }.toSet
    val got = Queries.hostSim(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5))).toSet
    assert(got == want)
  }

  test("join_counts matches an exact pair recomputation") {
    import spark.implicits._
    import graft.core.CellMath
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "event_type").as[(Long, String)].collect()
    val byCell = ev.groupBy { case (id, _) => CellMath.lonLatToCell(6,
      (id * 7919 % 360000) / 1000.0 - 180.0, (id * 104729 % 160000) / 1000.0 - 80.0)
    }
    val jc = collection.mutable.Map.empty[(String, String), Long]
    byCell.values.foreach { rows =>
      val n = rows.groupBy(_._2).map { case (t, a) => t -> a.length.toLong }
      for (a <- n.keys; b <- n.keys if a <= b) {
        val v = if (a == b) n(a) * (n(a) - 1) / 2 else n(a) * n(b)
        jc((a, b)) = jc.getOrElse((a, b), 0L) + v
      }
    }
    val tot = ev.groupBy(_._2).map { case (t, a) => t -> a.length.toLong }
    val want = jc.collect { case ((a, b), v) if v > 0 || true =>
      (a, b, v, tot(a), tot(b))
    }.toSet
    val got = Queries.joinCounts(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    assert(got.size == 15, s"expected 15 type pairs, got ${got.size}")
  }

  test("knn_classify votes match the reverse_topk output; cell_gini exact") {
    import spark.implicits._
    import graft.core.CellMath
    // vote recompute over the (already oracle-gated) top-3 neighbor sets
    val topk = graft.ops.Geocode.reverseTopK(
        graft.synth.Synth.eventPoints(spark, sf),
        graft.synth.Synth.custFeatures(spark, sf), z = 8, r = 2, limit = 3)
      .selectExpr("event_id", "feature_id").as[(Long, Long)].collect()
    val want = topk.groupBy(_._1).map { case (e, rows) =>
      val byCls = rows.groupBy(_._2 % 5).map { case (c, a) => (c, a.length.toLong) }
      val (cls, votes) = byCls.toSeq.minBy { case (c, v) => (-v, c) }
      e -> ((cls, votes))
    }
    val got = Queries.knnClassify(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    assert(want.values.map(_._1).toSet.size > 1, "single-class votes: vacuous")

    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id").as[Long].collect()
    val cnts = ev.map(id => CellMath.lonLatToCell(6,
        (id * 7919 % 360000) / 1000.0 - 180.0, (id * 104729 % 160000) / 1000.0 - 80.0))
      .groupBy(identity _).toSeq.map { case (c, a) => (c, a.length.toLong) }
      .sortBy { case (c, v) => (v, c) }
    val n = cnts.length.toLong
    val tot = cnts.map(_._2).sum
    val sic = cnts.zipWithIndex.map { case ((_, v), i) => (i + 1) * v }.sum
    val gn = 2 * sic - (n + 1) * tot
    val row = Queries.cellGini(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((n, tot, gn)))
    assert(gn > 0, "zero inequality: fixture vacuous")
  }

  test("median_center matches a quantized Weiszfeld replay and lowers the objective") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "event_type").as[(Long, String)].collect()
    def rnd(v: Double): Long =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val want = ev.groupBy(_._2).map { case (ty, rows) =>
      val pts = rows.map { case (id, _) =>
        (id * 7919 % 360000, id * 104729 % 160000)
      }
      val n = pts.length.toLong
      var cx = pts.map(p => BigInt(p._1)).sum / n
      var cy = pts.map(p => BigInt(p._2)).sum / n
      var objInit = -1.0
      for (k <- 1 to 3) {
        if (k == 1) objInit = pts.map { case (x, y) =>
          math.sqrt(((x - cx) * (x - cx) + (y - cy) * (y - cy)).toDouble)
        }.sum
        var (swx, swy, sw) = (BigInt(0), BigInt(0), BigInt(0))
        pts.foreach { case (x, y) =>
          val d2 = (BigInt(x) - cx) * (BigInt(x) - cx) + (BigInt(y) - cy) * (BigInt(y) - cy)
          if (d2 != 0) {
            val dd = math.sqrt(d2.toDouble)
            sw += rnd(1000000000.0 / dd)
            swx += rnd(x.toLong * 1000000000.0 / dd)
            swy += rnd(y.toLong * 1000000000.0 / dd)
          }
        }
        cx = swx / sw; cy = swy / sw
      }
      val objFinal = pts.map { case (x, y) =>
        math.sqrt(((x - cx) * (x - cx) + (y - cy) * (y - cy)).toDouble)
      }.sum
      assert(objFinal <= objInit, s"$ty objective rose: $objFinal > $objInit")
      ty -> ((n, cx.toLong - 180000, cy.toLong - 80000))
    }
    val got = Queries.medianCenter(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
  }

  test("tile_diff matches a snapshot-half recomputation") {
    import spark.implicits._
    import graft.core.CellMath
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .as[(Long, Long)].collect()
    val half = (ev.map(_._2).min + ev.map(_._2).max + 1) / 2
    def cellOf(id: Long) = CellMath.lonLatToCell(6,
      (id * 7919 % 360000) / 1000.0 - 180.0, (id * 104729 % 160000) / 1000.0 - 80.0)
    val a = ev.filter(_._2 < half).groupBy(e => cellOf(e._1)).view.mapValues(_.length.toLong)
    val b = ev.filter(_._2 >= half).groupBy(e => cellOf(e._1)).view.mapValues(_.length.toLong)
    val want = (a.keySet ++ b.keySet).map { c =>
      (c, a.getOrElse(c, 0L), b.getOrElse(c, 0L))
    }.collect { case (c, x, y) if y - x != 0 => (c, x, y, y - x) }.toSet
    val got = Queries.tileDiff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    assert(got.exists(_._4 > 0) && got.exists(_._4 < 0), "one-sided diff: vacuous")
  }

  test("host_geo matches an exact BigInt profile recomputation") {
    import spark.implicits._
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id").as[Long].collect()
    val want = ids.groupBy(_ % 97).map { case (h, ds) =>
      val xs = ds.map(d => BigInt(d * 7919 % 360000))
      val ys = ds.map(d => BigInt(d * 104729 % 140000))
      val n = BigInt(ds.length)
      val (sx, sy) = (xs.sum, ys.sum)
      val s2 = xs.map(x => x * x).sum + ys.map(y => y * y).sum
      s"h$h.example.org" -> ((ds.length.toLong,
        (sx / n).toLong - 180000, (sy / n).toLong - 70000,
        (n * s2 - sx * sx - sy * sy).toLong))
    }
    val got = Queries.hostGeo(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    assert(want.values.exists(_._4 > 0), "zero dispersion everywhere: vacuous")
  }

  test("gravity_fit matches an exact BigInt regression recomputation") {
    import spark.implicits._
    import graft.core.CellMath
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .as[(Long, Long, Long)].collect()
    def cellOf(id: Long): Long = CellMath.lonLatToCell(6,
      (id * 7919 % 360000) / 1000.0 - 180.0, (id * 104729 % 160000) / 1000.0 - 80.0)
    val flows = ev.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val cs = rows.sortBy(r => (r._3, r._1)).map(r => cellOf(r._1))
      cs.zip(cs.drop(1))
    }.groupBy(p => p).map { case ((o, d), a) => (o, d, a.size.toLong) }
      .filter { case (o, d, _) => o != d }
    val q = flows.map { case (o, d, f) =>
      val dx = CellMath.xOf(o) - CellMath.xOf(d)
      val dy = CellMath.yOf(o) - CellMath.yOf(d)
      val xq = BigDecimal(math.log((dx * dx + dy * dy).toDouble) * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val yq = BigDecimal(math.log(f.toDouble) * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      (BigInt(xq), BigInt(yq))
    }.toSeq
    val n = BigInt(q.size)
    val sx = q.map(_._1).sum; val sy = q.map(_._2).sum
    val sxy = q.map(p => p._1 * p._2).sum; val sxx = q.map(p => p._1 * p._1).sum
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val den = (n * sxx - sx * sx).toDouble
    val wantSlope = r4((n * sxy - sx * sy).toDouble / den)
    val wantIcept = r4((sy * sxx - sx * sxy).toDouble / den / 1000000.0)
    val row = Queries.gravityFit(spark, sf).collect().head
    assert(row.getLong(0) == q.size.toLong)
    assert(math.abs(row.getDouble(1) - wantSlope) < 1e-9, s"slope ${row.getDouble(1)} vs $wantSlope")
    assert(math.abs(row.getDouble(2) - wantIcept) < 1e-9, s"icept ${row.getDouble(2)} vs $wantIcept")
  }

  test("funnel_steps matches a sequential-walk recomputation with depth variety") {
    import spark.implicits._
    val win = 43200000000L
    val steps = Seq("view", "click", "signup", "purchase")
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "event_id", "event_type")
      .as[(Long, Long, Long, String)].collect()
    val want = ev.groupBy(_._1).map { case (u, rows) =>
      val t = Array.fill(4)(-1L)
      rows.sortBy(r => (r._2, r._3)).foreach { case (_, us, _, ty) =>
        val k = steps.indexOf(ty)
        if (k == 0 && t(0) == -1L) t(0) = us
        else if (k > 0 && t(k - 1) != -1L && t(k) == -1L &&
          us > t(k - 1) && us <= t(k - 1) + win) t(k) = us
      }
      val depth = t.lastIndexWhere(_ != -1L) + 1
      u -> ((t(0), t(1), t(2), t(3), depth.toLong))
    }
    val got = Queries.funnelSteps(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == want)
    assert(want.values.map(_._5).toSet.size >= 3, "funnel depth vacuous")
  }

  test("trans_entropy matches a quantized-term recomputation") {
    import spark.implicits._
    import graft.core.CellMath
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .as[(Long, Long, Long)].collect()
    def cellOf(id: Long): Long = CellMath.lonLatToCell(6,
      (id * 7919 % 360000) / 1000.0 - 180.0, (id * 104729 % 160000) / 1000.0 - 80.0)
    val flows = ev.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val cs = rows.sortBy(r => (r._3, r._1)).map(r => cellOf(r._1))
      cs.zip(cs.drop(1))
    }.groupBy(p => p).map { case ((o, d), a) => (o, d, a.size.toLong) }
    val want = flows.groupBy(_._1).map { case (o, fs) =>
      val n = fs.map(_._3).sum
      val ent = fs.map { case (_, _, v) =>
        val p = v.toDouble / n
        BigDecimal(-p * math.log(p) * 1000000000.0)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum
      o -> ((n, fs.size.toLong, ent))
    }
    val got = Queries.transEntropy(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
  }

  test("dow_profile matches an integer chi-square recomputation") {
    import spark.implicits._
    import graft.core.CellMath
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .as[(Long, Long)].collect()
    val want = ev.groupBy { case (id, _) => CellMath.lonLatToCell(6,
      (id * 7919 % 360000) / 1000.0 - 180.0, (id * 104729 % 160000) / 1000.0 - 80.0)
    }.map { case (c, rows) =>
      val o = Array.fill(7)(0L)
      rows.foreach { case (_, us) => o(((us / 86400000000L + 4) % 7).toInt) += 1 }
      val n = o.sum
      c -> ((n, o.map(v => (7 * v - n) * (7 * v - n)).sum))
    }
    val got = Queries.dowProfile(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    assert(want.values.exists(_._2 > 0), "perfectly uniform: chi vacuous")
  }

  test("pmi_pairs matches a plain-Scala collocation recomputation") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").as[(Long, String)].collect()
    val toks = docs.map { case (_, t) => t.split(" ").take(10).distinct.toSeq }
    val nDocs = docs.length
    val cp = toks.flatMap { ts =>
      for (i <- ts.indices; j <- i + 1 until ts.length)
        yield if (ts(i) < ts(j)) (ts(i), ts(j)) else (ts(j), ts(i))
    }.groupBy(p => p).map { case (k, a) => k -> a.size.toLong }.filter(_._2 >= 3)
    val ct = toks.flatten.groupBy(t => t).map { case (t, a) => t -> a.size.toLong }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = cp.toSeq.map { case ((a, b), cxy) =>
      val pmi = math.log(nDocs.toDouble * cxy / (ct(a).toDouble * ct(b)))
      (a, b, cxy, ct(a), ct(b), pmi)
    }.sortBy(r => (-r._6, r._1, r._2)).take(50).zipWithIndex
      .map { case ((a, b, cxy, ca, cb, pmi), i) => (a, b, cxy, ca, cb, r6(pmi), (i + 1).toLong) }
      .toSet
    val got = Queries.pmiPairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6))).toSet
    assert(got == want)
  }

  test("crawl_frontier matches a plain-Scala politeness schedule") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "CAST(n_chars AS BIGINT)").as[(Long, Long)].collect()
    val want = docs
      .map { case (d, nc) => (d, nc, s"h${d % 97}.example.org", d % 97 % 16, d / 4096) }
      .groupBy(r => (r._3, r._5)).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._2, r._1)).zipWithIndex.map { case ((d, _, h, sh, b), i) =>
          (d, h, sh, b, (i + 1).toLong, i.toLong * 500000L)
        }
      }.toSet
    val got = Queries.crawlFrontier(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    assert(got.exists(_._5 > 1), "all ranks 1: batching degenerate")
  }
}
