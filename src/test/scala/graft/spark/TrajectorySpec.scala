package graft.spark

import org.apache.spark.sql.functions._
import graft.queries.Queries
import graft.core.CellMath

/** Trajectory/raster ops vs brute-force driver references on sf0.001:
  * OD flows, trip segmentation, 3×3 cell smoothing. */
class TrajectorySpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def events =
    spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  private def cellOf(id: Long): Long =
    CellMath.lonLatToCell(6,
      (id * 7919 % 360000) / 1000.0 - 180.0,
      (id * 104729 % 160000) / 1000.0 - 80.0)

  test("od_flows matches the brute per-user transition count") {
    val want = events.groupBy(_._2).values.flatMap { evs =>
      val cells = evs.sortBy(e => (e._3, e._1)).map(e => cellOf(e._1))
      cells.zip(cells.drop(1))
    }.toSeq.groupBy(x => x).map { case (k, v) => (k._1, k._2, v.size.toLong) }.toSet
    val got = Queries.odFlows(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty && got == want)
  }

  test("trip_segments matches the brute gap-split reference") {
    val want = events.groupBy(_._2).flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._1))
      var trip = 0L
      var prev = Long.MinValue
      val assigned = sorted.map { e =>
        if (prev != Long.MinValue && e._3 - prev > 1800000000L) trip += 1
        prev = e._3
        (trip, e._3)
      }
      assigned.groupBy(_._1).map { case (t, xs) =>
        (uid, t, xs.size.toLong, xs.map(_._2).max - xs.map(_._2).min)
      }
    }.toSet
    val got = Queries.tripSegments(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // every user has at least one multi-trip split at sf0.001 density, so
    // the gate exercises the gap flag (guard against a vacuous compare)
    assert(want.exists(_._2 > 0))
    assert(got == want)
  }

  test("cell_smooth matches the brute 3x3 neighbor sum") {
    val counts = events.map(e => cellOf(e._1))
      .groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
    def xy(cell: Long): (Long, Long) =
      ((cell % 72057594037927936L) / 268435456L, cell % 268435456L)
    val want = counts.map { case (cell, cnt) =>
      val (x, y) = xy(cell)
      val sm = (for {
        dx <- -1 to 1; dy <- -1 to 1
        if x + dx >= 0 && x + dx < 64 && y + dy >= 0 && y + dy < 64
        c = counts.get(cell + dx * 268435456L + dy)
      } yield c.getOrElse(0L)).sum
      (cell, cnt, sm)
    }.toSet
    val got = Queries.cellSmooth(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.exists { case (_, cnt, sm) => sm > cnt }) // neighbors exist
    assert(got == want)
  }

  test("co_locate matches the brute same-cell-within-window pair scan") {
    val d = 21600000000L
    val pts = events.map { case (id, u, us) =>
      (id, u, us,
        (id * id * 7919 + id * 104729) % 360000 / 6000,
        (id * id * 104729 + id * 7919) % 160000 / 6000)
    }
    val meets = for {
      a <- pts; b <- pts
      if a._4 == b._4 && a._5 == b._5 && a._2 != b._2
      if a._3 < b._3 || (a._3 == b._3 && a._1 < b._1)
      if b._3 - a._3 <= d
    } yield (math.min(a._2, b._2), math.max(a._2, b._2),
      a._4 * 100 + a._5, b._3 - a._3)
    val want = meets.groupBy(m => (m._1, m._2)).map { case ((u1, u2), xs) =>
      (u1, u2, xs.size.toLong, xs.map(_._3).distinct.size.toLong, xs.map(_._4).min)
    }.toSet
    // non-vacuous: same-cell cross-user pairs OUTSIDE the window exist,
    // so the time gate (and hence the bucket blocking) is exercised
    val rejected = pts.exists(a => pts.exists(b =>
      a._4 == b._4 && a._5 == b._5 && a._2 != b._2 && b._3 - a._3 > d))
    assert(want.nonEmpty && rejected)
    val got = Queries.coLocate(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == want)
  }

  test("dp_simplify day-segmented key: (user, day) grouping ≡ per-day runs") {
    import org.apache.spark.sql.functions._
    // 3 users × 4 days × 40 points, scattered coords; the day-keyed entry
    // point (the 10^12-scale contract) must equal running the kernel on
    // each day slice independently
    val pts = spark.range(480).toDF("id")
      .withColumn("user_id", col("id") % 3)
      .withColumn("day", (col("id") / 120).cast("long"))
      .withColumn("us", col("id") * 1000L)
      .withColumn("x", (col("id") * col("id") * 7919 + col("id") * 104729) % 360000 - 180000)
      .withColumn("y", (col("id") * col("id") * 104729 + col("id") * 7919) % 160000 - 80000)
    val keyed = Queries.dpSimplifyOf(pts, Seq("user_id", "day"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val perDay = (0L to 3L).flatMap { d =>
      Queries.dpSimplifyOf(pts.filter(col("day") === d), Seq("user_id"))
        .collect().map(r => (r.getLong(0), d, r.getLong(1)))
    }.toSet
    assert(keyed.nonEmpty && keyed == perDay)
    // segmentation is REAL (not a relabeling of the global run): the kept
    // id set differs — each day contributes its own endpoints while
    // losing the cross-day refinement splits
    val global = Queries.dpSimplifyOf(pts, Seq("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keyed.map(t => (t._1, t._3)) != global)
  }
}
