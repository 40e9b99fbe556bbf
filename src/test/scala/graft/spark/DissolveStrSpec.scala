package graft.spark

import org.apache.spark.sql.functions._
import graft.queries.Queries
import graft.synth.Synth

/** Rect dissolve (union area) vs an independent integer rasterization, and
  * STR packing vs a from-scratch ntile replication. */
class DissolveStrSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("rect_dissolve: sweep area equals brute raster fill on a literal fixture") {
    import spark.implicits._
    // overlapping, nested, disjoint and touching rects in one group + a
    // second group to prove group isolation
    val rects = Seq(
      (0L, 1L, 0L, 0L, 10L, 10L),   // base
      (0L, 2L, 5L, 5L, 15L, 12L),   // overlaps base
      (0L, 3L, 2L, 2L, 4L, 4L),     // nested in base
      (0L, 4L, 20L, 0L, 25L, 5L),   // disjoint
      (0L, 5L, 10L, 0L, 12L, 3L),   // touches base's east edge
      (1L, 6L, 0L, 0L, 3L, 3L))
      .toDF("gkey", "feature_id", "wq", "sq", "eq", "nq")
    val out = Queries.rectDissolveOf(rects).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def raster(rs: Seq[(Long, Long, Long, Long)]): Long =
      (for {
        x <- 0L until 30L; y <- 0L until 15L
        if rs.exists { case (w, s, e, n) => x >= w && x < e && y >= s && y < n }
      } yield 1L).sum
    val g0 = raster(Seq((0, 0, 10, 10), (5, 5, 15, 12), (2, 2, 4, 4), (20, 0, 25, 5), (10, 0, 12, 3)))
    assert(out(0L) == ((5L, g0)))
    assert(out(1L) == ((1L, 9L)))
  }

  test("rect_dissolve at sf0.001: union area bounded by max-rect and sum-of-rects") {
    val rects = Synth.custFeatures(spark, sf)
      .select(col("feature_id"), (col("feature_id") % 64).as("gkey"),
        round(col("west") * 1000, 0).cast("long").as("wq"),
        round(col("south") * 1000, 0).cast("long").as("sq"),
        round(col("east") * 1000, 0).cast("long").as("eq"),
        round(col("north") * 1000, 0).cast("long").as("nq"))
    val perRect = rects
      .withColumn("a", (col("eq") - col("wq")) * (col("nq") - col("sq")))
      .groupBy("gkey").agg(sum("a").as("sum_a"), max("a").as("max_a"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    Queries.rectDissolve(spark, sf).collect().foreach { r =>
      val (sumA, maxA) = perRect(r.getLong(0))
      val u = r.getLong(2)
      assert(u <= sumA && u >= maxA, s"gkey ${r.getLong(0)}: $u vs [$maxA, $sumA]")
    }
  }

  test("str_pack: leaves match a from-scratch STR replication; occupancy balanced") {
    def ntileSplit[T](xs: Seq[T], n: Int): Seq[Seq[T]] = {
      val m = xs.length; val base = m / n; val extra = m % n
      val sizes = (0 until n).map(i => base + (if (i < extra) 1 else 0))
      sizes.foldLeft((xs, Seq.empty[Seq[T]])) { case ((rest, acc), sz) =>
        (rest.drop(sz), acc :+ rest.take(sz))
      }._2
    }
    val rows = Synth.custFeatures(spark, sf)
      .select(col("feature_id"),
        round(col("flon") * 1000, 0).cast("long").as("cx"),
        round(col("flat") * 1000, 0).cast("long").as("cy"),
        round(col("west") * 1000, 0).cast("long").as("wq"),
        round(col("south") * 1000, 0).cast("long").as("sq"),
        round(col("east") * 1000, 0).cast("long").as("eq"),
        round(col("north") * 1000, 0).cast("long").as("nq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val expect = ntileSplit(rows.sortBy(r => (r._2, r._1)).toSeq, 8).zipWithIndex.flatMap {
      case (slice, sx) =>
        ntileSplit(slice.sortBy(r => (r._3, r._1)), 8).zipWithIndex.map { case (leafRs, sy) =>
          (sx * 8 + sy).toLong ->
            (leafRs.size.toLong, leafRs.map(_._4).min, leafRs.map(_._5).min,
              leafRs.map(_._6).max, leafRs.map(_._7).max)
        }
    }.toMap
    val got = Queries.strPack(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == expect)
    val occs = got.values.map(_._1)
    assert(got.size == 64 && occs.max - occs.min <= 2)
  }
}
