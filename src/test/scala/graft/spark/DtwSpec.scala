package graft.spark

import org.apache.spark.sql.functions._
import graft.functions.F
import graft.queries.Queries

/** DTW trajectory similarity: kernel pinned against an independent
  * full-matrix DP over random tracks, plus join-level invariants. */
class DtwSpec extends SparkTestBase {

  private def pack(x: Long, y: Long): Long = (8L << 56) + x * 268435456L + y

  private def dtwRef(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Long = {
    val big = Long.MaxValue / 4
    val m = a.length; val n = b.length
    val d = Array.fill(m + 1, n + 1)(big)
    d(0)(0) = 0L
    for (i <- 1 to m; j <- 1 to n) {
      val c = math.abs(a(i - 1)._1 - b(j - 1)._1) + math.abs(a(i - 1)._2 - b(j - 1)._2)
      d(i)(j) = c + math.min(d(i - 1)(j), math.min(d(i)(j - 1), d(i - 1)(j - 1)))
    }
    d(m)(n)
  }

  private def run(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Long = {
    import spark.implicits._
    val df = Seq((a.map { case (x, y) => pack(x, y) }, b.map { case (x, y) => pack(x, y) }))
      .toDF("a", "b")
    df.select(F.dtwCells(col("a"), col("b"))).collect().head.getLong(0)
  }

  private def frechetRef(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Long = {
    val big = Long.MaxValue / 4
    val m = a.length; val n = b.length
    val d = Array.fill(m + 1, n + 1)(big)
    d(0)(0) = 0L
    for (i <- 1 to m; j <- 1 to n) {
      val c = math.abs(a(i - 1)._1 - b(j - 1)._1) + math.abs(a(i - 1)._2 - b(j - 1)._2)
      d(i)(j) = math.max(c, math.min(d(i - 1)(j), math.min(d(i)(j - 1), d(i - 1)(j - 1))))
    }
    d(m)(n)
  }

  private def runF(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Long = {
    import spark.implicits._
    val df = Seq((a.map { case (x, y) => pack(x, y) }, b.map { case (x, y) => pack(x, y) }))
      .toDF("a", "b")
    df.select(F.frechetCells(col("a"), col("b"))).collect().head.getLong(0)
  }

  test("frechet_cells: identity, bound by max step, 200 random tracks vs full-matrix DP") {
    val t = Seq((1L, 1L), (2L, 3L), (5L, 5L), (9L, 2L))
    assert(runF(t, t) == 0L)
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { k =>
      val m = 1 + rnd.nextInt(12); val n = 1 + rnd.nextInt(12)
      val a = Seq.fill(m)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
      val b = Seq.fill(n)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
      val f = runF(a, b)
      assert(f == frechetRef(a, b), s"trial $k")
      assert(f <= dtwRef(a, b), s"frechet bounded by dtw, trial $k")
    }
  }

  test("dtw_cells: identity, shift, and 200 random tracks vs full-matrix DP") {
    val t = Seq((1L, 1L), (2L, 3L), (5L, 5L), (9L, 2L))
    assert(run(t, t) == 0L)
    assert(run(Seq((0L, 0L)), Seq((3L, 4L))) == 7L)
    // one-step shift absorbs via warping: [0,1,2] vs [1,2,3] on x only
    val s1 = Seq((0L, 0L), (1L, 0L), (2L, 0L))
    val s2 = Seq((1L, 0L), (2L, 0L), (3L, 0L))
    assert(run(s1, s2) == 2L) // endpoints pay 1 each
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { k =>
      val m = 1 + rnd.nextInt(12); val n = 1 + rnd.nextInt(12)
      val a = Seq.fill(m)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
      val b = Seq.fill(n)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
      assert(run(a, b) == dtwRef(a, b), s"trial $k")
    }
  }

  test("dtw_tracks join: capped fan-out, symmetric-free pairs, self-distance absent") {
    val out = Queries.dtwTracks(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))          // u1 < u2
      assert(r.getLong(3) >= 2 && r.getLong(3) <= 12)
      assert(r.getLong(5) >= 0)
    }
    val fanOut = out.groupBy(_.getLong(0)).map(_._2.length)
    assert(fanOut.max <= 8)
  }
}
